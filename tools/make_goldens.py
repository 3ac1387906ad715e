"""Generate the committed oracle goldens under goldens/.

Some driver-contract queries exercise code whose math cannot be
re-derived in pure SQL from the testdata views alone (codec decodes,
hash pipelines, FFTs, fitted models, HLL sketches); for each, this
script precomputes a small parquet the oracle SQL joins against.
Goldens are built WITHOUT Spark (pyarrow + numpy + duckdb + an
independent pure-Python XXH64) wherever possible, so the driver-side
comparison still pits two independent execution paths against each
other; the single exception is the r9b HLL++ determinism golden, which
necessarily runs the pinned Spark build once offline.

* goldens/x11_decode.parquet — the deterministic fake image decoder
  (operators/multimodal.py:_fake_decode: sha256(payload) seeds a PCG64,
  8x8x3 uint8 pixels, mean). Keyed by the payload's sha256 hex so the
  oracle can join it to ANY documents view (`sha256(text)` in DuckDB hashes
  the same utf-8 bytes); rows for all three sf dirs are unioned and
  deduped.

* goldens/x9_centroids.parquet — the IVF centroids for nlist=8 /
  sample_rows=2000 / iters=10 / seed=5 fitted on the vec_id-ordered sample
  (exactly what _q_x9_ivf_topk fits at runtime via
  similarity.lloyd_kmeans, which this script imports so the floats are
  bit-identical). Keyed by `corpus_key` = DuckDB
  bit_xor(hash(vec_id, embedding::DOUBLE[]::VARCHAR)) over the embeddings
  table — content-derived, order-independent, and recomputable inside the
  oracle SQL itself, so the right centroid set is selected no matter which
  sf dir the driver runs against.

Rerun after any testdata refresh: python tools/make_goldens.py
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modis_aggregation_spark.operators.similarity import (  # noqa: E402
    lloyd_kmeans,
    pq_fit_sample,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")

CORPUS_KEY_SQL = (
    "SELECT bit_xor(hash(vec_id, embedding::DOUBLE[]::VARCHAR)) "
    "FROM read_parquet(?)"
)


def x11_decode_golden() -> pa.Table:
    """Recompute _fake_decode's (height, width, channels, mean_pixel) per
    distinct document payload, keyed by sha256 hex."""
    seen: dict[str, float] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8")
            digest = hashlib.sha256(payload)
            key = digest.hexdigest()
            if key in seen:
                continue
            rng = np.random.default_rng(int.from_bytes(digest.digest()[:8], "big"))
            seen[key] = float(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8).mean())
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "height": pa.array([8] * len(keys), pa.int32()),
            "width": pa.array([8] * len(keys), pa.int32()),
            "channels": pa.array([3] * len(keys), pa.int32()),
            "mean_pixel": pa.array([seen[k] for k in keys], pa.float64()),
        }
    )


def x61_png_golden() -> pa.Table:
    """Recompute the x61 REAL-PNG-decode expectation per distinct document
    payload WITHOUT touching the PNG codec: the query builds a 12×9
    grayscale image by cyclically tiling the text's utf-8 bytes, encodes
    it as PNG (pnglite), decodes it back (decoder='png') and
    nearest-neighbor-resamples to 8×8×3. Gray replication and
    nearest-neighbor selection are pure index arithmetic, so the expected
    mean is computable straight from the tiled bytes — if decode_png
    mis-parsed anything the Spark side would diverge. Keyed by
    sha256(text)."""
    ridx = (np.arange(8) * 12) // 8
    cidx = (np.arange(8) * 9) // 8
    seen: dict[str, float] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            img = np.resize(np.frombuffer(payload, np.uint8), (12, 9))
            seen[key] = float(img[ridx][:, cidx].mean())
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "height": pa.array([8] * len(keys), pa.int32()),
            "width": pa.array([8] * len(keys), pa.int32()),
            "channels": pa.array([3] * len(keys), pa.int32()),
            "mean_pixel": pa.array([seen[k] for k in keys], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Independent XXH64 (pure Python/numpy), equivalent to Spark's xxhash64
# expression: the public xxHash specification (Cyan4973/xxHash, BSD) with
# Spark's seeding (42) and per-argument chaining (each argument's hash
# becomes the next argument's seed; IntegerType arguments take the 4-byte
# path, LongType the 8-byte path).  Verified equal to Spark's xxhash64 for
# strings, longs, int-seeded remixes and long chains in
# tests/test_golden_hash_parity.py — this lets the x5/x6 goldens be
# recomputed WITHOUT Spark, making them an independent oracle for the
# whole MinHash/SimHash pipeline, not a replay of it.
# ---------------------------------------------------------------------------

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xrotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xfmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of a byte string (Spark ``xxhash64(string_col)`` ≡
    ``xxh64_bytes(utf8, 42)`` as signed 64-bit)."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [
            (seed + _XP1 + _XP2) & _M64,
            (seed + _XP2) & _M64,
            seed & _M64,
            (seed - _XP1) & _M64,
        ]
        while i + 32 <= n:
            for k in range(4):
                lane = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                a = (v[k] + lane * _XP2) & _M64
                v[k] = (_xrotl(a, 31) * _XP1) & _M64
            i += 32
        h = (
            _xrotl(v[0], 1) + _xrotl(v[1], 7) + _xrotl(v[2], 12) + _xrotl(v[3], 18)
        ) & _M64
        for k in range(4):
            k1 = (_xrotl((v[k] * _XP2) & _M64, 31) * _XP1) & _M64
            h = ((h ^ k1) * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = int.from_bytes(data[i : i + 8], "little")
        k1 = (_xrotl((k1 * _XP2) & _M64, 31) * _XP1) & _M64
        h ^= k1
        h = (_xrotl(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_xrotl(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_xrotl(h, 11) * _XP1) & _M64
        i += 1
    return _xfmix(h)


def xxh64_long(v: int, seed: int) -> int:
    """Spark's 8-byte (LongType) hash step."""
    return xxh64_bytes((v & _M64).to_bytes(8, "little"), seed)


def xxh64_int(i: int, seed: int) -> int:
    """Spark's 4-byte (IntegerType) hash step — the scalar form of
    ``xxh64_int_vec_seeded`` (the ``xxhash64(col, lit(i))`` remix)."""
    h = (seed + _XP5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _XP1) & _M64
    h = (_xrotl(h, 23) * _XP2 + _XP3) & _M64
    return _xfmix(h)


def _u64(x: int) -> np.uint64:
    return np.uint64(x & _M64)


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _u64(r)) | (x >> _u64(64 - r))


def _vfmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _u64(33))
    h = h * _u64(_XP2)
    h = h ^ (h >> _u64(29))
    h = h * _u64(_XP3)
    return h ^ (h >> _u64(32))


def xxh64_long_vec(v: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized 8-byte path over a uint64 array (scalar seed)."""
    h = _u64(seed + _XP5 + 8)
    k1 = _vrotl(v * _u64(_XP2), 31) * _u64(_XP1)
    h = h ^ k1
    h = _vrotl(h, 27) * _u64(_XP1) + _u64(_XP4)
    return _vfmix(h)


def xxh64_int_vec_seeded(i: int, seeds: np.ndarray) -> np.ndarray:
    """Vectorized 4-byte (IntegerType) path: scalar value, per-element
    seed — the shape of ``xxhash64(h, lit(i))`` remixes."""
    h = seeds + _u64(_XP5 + 4)
    h = h ^ _u64(((i & 0xFFFFFFFF) * _XP1) & _M64)
    h = _vrotl(h, 23) * _u64(_XP2) + _u64(_XP3)
    return _vfmix(h)


# Java's default (non-UNICODE_CHARACTER_CLASS) \s — what Spark's
# regexp_replace(·, '\\s+', ' ') matches; Python's str \s is wider.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
# functions/text.py tokens(): the explicit RE2/Java-agreeing class.
_TOKEN_WS = re.compile(r"[ \t\n\f\r]+")


def _minhash_doc(text: str, k: int = 5, num_hashes: int = 32, num_bands: int = 8):
    """(sh sorted distinct signed, band keys) replicating
    operators/dedup.py minhash_signatures + _band_keys semantics."""
    norm = _JAVA_WS.sub(" ", text.lower())
    n_sub = max(len(norm) - (k - 1), 1)
    seen: dict[str, None] = {}
    for i in range(n_sub):
        seen.setdefault(norm[i : i + k], None)
    hs = np.array(
        [xxh64_bytes(s.encode("utf-8")) for s in seen], dtype=np.uint64
    )
    base = xxh64_long_vec(hs, 42)
    sig = np.empty(num_hashes, dtype=np.int64)
    for i in range(num_hashes):
        sig[i] = xxh64_int_vec_seeded(i, base).view(np.int64).min()
    rows = num_hashes // num_bands
    bands = []
    for b in range(num_bands):
        h = 42
        for r in range(rows):
            h = xxh64_long(int(sig[b * rows + r]), h)
        bands.append(h - (1 << 64) if h >= (1 << 63) else h)
    sh_signed = np.sort(hs.view(np.int64))
    return sh_signed.tolist(), bands


def _simhash_doc(text: str):
    """(simhash signed long, 4×16-bit chunk keys) replicating
    operators/dedup.py simhash semantics (token multiset, not set)."""
    toks = [t for t in _TOKEN_WS.split(text.lower()) if t]
    if not toks:
        hs = np.zeros(0, dtype=np.uint64)
    else:
        hs = np.array([xxh64_bytes(t.encode("utf-8")) for t in toks], np.uint64)
    out = 0
    if hs.size:
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _u64(1)
        votes = 2 * bits.sum(0).astype(np.int64) - len(toks)
        out = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    chunks = [(out >> (16 * c)) & 0xFFFF for c in range(4)]
    sh = out - (1 << 64) if out >= (1 << 63) else out
    return sh, chunks


def x5_minhash_golden() -> pa.Table:
    """Per-distinct-document MinHash artifacts recomputed WITHOUT Spark
    (independent XXH64 + independent shingle/signature/band logic): the
    DuckDB x5 oracle re-derives the LSH candidate pairs, bucket caps and
    exact hashed-shingle Jaccard from these committed values in SQL, so a
    drift anywhere in the Spark pipeline (normalization, shingling,
    hashing, banding, capping, verification) diverges the join values.
    Keyed by sha256(text)."""
    seen: dict[str, tuple] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = _minhash_doc(text)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "sh": pa.array([seen[k][0] for k in keys], pa.list_(pa.int64())),
            "bands": pa.array([seen[k][1] for k in keys], pa.list_(pa.int64())),
        }
    )


def x6_simhash_golden() -> pa.Table:
    """Per-distinct-document SimHash (independent recomputation, as x5);
    the DuckDB x6 oracle re-derives the 16-bit-chunk candidate join and
    Hamming verification from these values."""
    seen: dict[str, tuple] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = _simhash_doc(text)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "sh": pa.array([seen[k][0] for k in keys], pa.int64()),
            "chunks": pa.array([seen[k][1] for k in keys], pa.list_(pa.int64())),
        }
    )


def x95_cms_buckets_golden() -> pa.Table:
    """Per-distinct-term Count-Min row buckets (independent XXH64, as
    x5/x6): bucket_r = pmod(xxhash64(term, lit(r)), 64) for r in 0..3,
    reproduced here as the int-remix chain xxh64_int(r, seed=
    xxh64_bytes(term_utf8, 42)) so the x95 oracle re-derives the whole
    sketch and the min-estimate in SQL without Spark. Keyed by the term
    string itself (the term universe is the union of all sf corpora)."""
    width, depth = 64, 4
    terms: set[str] = set()
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            terms.update(t for t in _TOKEN_WS.split(text.lower()) if t)
    keys = sorted(terms)
    cols: dict[str, list] = {"term": keys}
    for r in range(depth):
        buckets = []
        for t in keys:
            h = xxh64_int(r, xxh64_bytes(t.encode("utf-8"), 42))
            signed = h - (1 << 64) if h >= (1 << 63) else h
            buckets.append(signed % width)  # Python %: floor mod == pmod
        cols[f"b{r}"] = buckets
    return pa.table(
        {"term": pa.array(keys, pa.string())}
        | {f"b{r}": pa.array(cols[f"b{r}"], pa.int64()) for r in range(depth)}
    )


def r9b_approx_distinct_golden() -> pa.Table:
    """Expected ``approx_count_distinct`` outputs per sf corpus.

    Spark's HLL++ is a pure function of the value SET — register updates
    are per-value hashes and merges are element-wise max (commutative,
    associative, idempotent), so the estimate is independent of
    partitioning and task order; given the pinned Spark version it is a
    committed-golden-able constant (the x56 determinism pattern). Keyed
    by a corpus fingerprint the oracle recomputes in DuckDB
    (``bit_xor(hash(...))`` over the orders view, the x9 pattern), so
    the right row set is selected no matter which sf dir the driver
    runs against."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("r9b-golden")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    cols = {"corpus_key": [], "o_orderstatus": [], "approx_custkeys": []}
    try:
        for sf in SF_DIRS:
            p = os.path.join(sf, "orders.parquet")
            key = duckdb.sql(
                "SELECT bit_xor(hash(o_orderkey, o_custkey, o_orderstatus)) "
                f"FROM read_parquet('{p}')"
            ).fetchone()[0]
            rows = (
                spark.read.parquet(p)
                .groupBy("o_orderstatus")
                .agg(F.approx_count_distinct("o_custkey").alias("a"))
                .collect()
            )
            for r in rows:
                cols["corpus_key"].append(int(key))
                cols["o_orderstatus"].append(r["o_orderstatus"])
                cols["approx_custkeys"].append(int(r["a"]))
    finally:
        spark.stop()
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.int64()),
            "o_orderstatus": pa.array(cols["o_orderstatus"], pa.string()),
            "approx_custkeys": pa.array(cols["approx_custkeys"], pa.int64()),
        }
    )


def x65_jpeg_golden() -> pa.Table:
    """Recompute the x65 REAL-JPEG-decode expectation per distinct
    document payload WITHOUT touching the JPEG codec: the query tiles the
    text's first utf-8 bytes (cyclic, &0xFE) into a 2×2 grid of constant
    even-valued 8×8 blocks — the exactly-representable subspace of
    baseline JPEG at quality 50 (DC 8·(v−128) divisible by the Annex-K
    quantizer 16, ACs zero), so encode→decode is bit-exact and the
    resampled 8×8×3 mean is pure index arithmetic over the four block
    values.  If decode_jpeg (Huffman/dequant/IDCT) mis-parsed anything
    the Spark side would diverge.  Keyed by sha256(text)."""
    ridx = (np.arange(8) * 16) // 8
    seen: dict[str, float] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            vals = np.resize(np.frombuffer(payload, np.uint8), (2, 2)) & 0xFE
            img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
            seen[key] = float(img[ridx][:, ridx].mean())
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "height": pa.array([8] * len(keys), pa.int32()),
            "width": pa.array([8] * len(keys), pa.int32()),
            "channels": pa.array([3] * len(keys), pa.int32()),
            "mean_pixel": pa.array([seen[k] for k in keys], pa.float64()),
        }
    )


def x110_lossless_golden() -> pa.Table:
    """Recompute the x110 LOSSLESS-JPEG-decode expectation per distinct
    document payload WITHOUT touching the codec: lossless JPEG (SOF3)
    reproduces samples bit-exactly, so the expected mean_pixel over the
    4x4 grayscale fixture (the text's first utf-8 bytes, cyclic) is the
    plain mean of those 16 bytes — no quantization subspace needed at
    all, unlike the x65/x88 DCT fixtures.  If any predictor path,
    restart handling or the difference decode mis-reconstructed a
    sample the Spark side would diverge.  Keyed by sha256(text)."""
    seen: dict[str, float] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            vals = np.resize(np.frombuffer(payload, np.uint8), 16)
            seen[key] = float(vals.mean())
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "height": pa.array([4] * len(keys), pa.int32()),
            "width": pa.array([4] * len(keys), pa.int32()),
            "channels": pa.array([3] * len(keys), pa.int32()),
            "mean_pixel": pa.array([seen[k] for k in keys], pa.float64()),
        }
    )


def x111_hll_golden() -> pa.Table:
    """Independent HyperLogLog register coordinates per distinct document
    text: bucket = top-8 bits of XXH64(utf8, seed 42) (the independent
    reimplementation of Spark's xxhash64), rho = 1 + leading zeros of
    the remaining 56 bits, UNclamped (the oracle SQL applies the same
    LEAST(rho, 50) the operator does).  If ``hll_register_entries``'s
    shift/bin() arithmetic mis-derived either coordinate the Spark side
    would diverge.  Keyed by sha256(text)."""
    seen: dict[str, tuple[int, int]] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            h = xxh64_bytes(text.encode("utf-8"), 42) & _M64
            bucket = h >> 56
            rest = h & ((1 << 56) - 1)
            rho = 57 - rest.bit_length() if rest else 57
            seen[key] = (bucket, rho)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "bucket": pa.array([seen[k][0] for k in keys], pa.int32()),
            "rho": pa.array([seen[k][1] for k in keys], pa.int32()),
        }
    )


def x62_wav_golden() -> pa.Table:
    """Recompute the x62 REAL-WAV-decode expectation per distinct document
    payload WITHOUT the wave codec: the query maps the text's utf-8 bytes
    to 1600 exact dyadic samples ((b−128)/128), writes real RIFF/PCM16
    bytes (stdlib wave), decodes them back and computes RMS / zero
    crossings on the decoded samples. Both mappings are exact in float64,
    so the expectation comes straight from the bytes — a RIFF mis-parse
    anywhere diverges. Keyed by sha256(text)."""
    seen: dict[str, tuple[float, int]] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            x = (np.resize(np.frombuffer(payload, np.uint8), 1600).astype(
                np.float64
            ) - 128.0) / 128.0
            rms = float(np.sqrt(np.mean(x**2)))
            zc = int(np.count_nonzero(np.diff(np.signbit(x))))
            seen[key] = (rms, zc)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "sample_rate": pa.array([8000] * len(keys), pa.int32()),
            "n_samples": pa.array([1600] * len(keys), pa.int64()),
            "duration_sec": pa.array([0.2] * len(keys), pa.float64()),
            "rms": pa.array([seen[k][0] for k in keys], pa.float64()),
            "zero_crossings": pa.array([seen[k][1] for k in keys], pa.int64()),
        }
    )


def x112_flac_golden() -> pa.Table:
    """Recompute the x112 REAL-FLAC-decode expectation per distinct
    document payload WITHOUT the flac codec: FLAC is lossless and the
    mono downmix mapping mirrors the WAV path exactly, so the identical
    RMS / zero-crossing math over 400 byte-derived dyadic samples IS
    the expectation (the x62 argument at a lighter fixture size).
    Keyed by sha256(text)."""
    seen: dict[str, tuple[float, int]] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            x = (np.resize(np.frombuffer(payload, np.uint8), 400).astype(
                np.float64
            ) - 128.0) / 128.0
            rms = float(np.sqrt(np.mean(x**2)))
            zc = int(np.count_nonzero(np.diff(np.signbit(x))))
            seen[key] = (rms, zc)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "sample_rate": pa.array([8000] * len(keys), pa.int32()),
            "n_samples": pa.array([400] * len(keys), pa.int64()),
            "duration_sec": pa.array([0.05] * len(keys), pa.float64()),
            "rms": pa.array([seen[k][0] for k in keys], pa.float64()),
            "zero_crossings": pa.array([seen[k][1] for k in keys], pa.int64()),
        }
    )


def x67_wav_spectrum_golden() -> pa.Table:
    """Recompute the x67 spectral-feature expectation per distinct
    document payload WITHOUT the wave codec: PCM16 round-trip is exact
    for the dyadic (b−128)/128 samples, so the identical numpy rFFT math
    over the byte-derived samples (drop DC; dominant = argmax bin,
    centroid = magnitude-weighted mean frequency, hf = energy fraction
    above fs/8) must match the decoded-path result bit-for-bit. Keyed by
    sha256(text)."""
    seen: dict[str, tuple[float, float, float]] = {}
    freqs = np.fft.rfftfreq(1600, 1.0 / 8000)[1:]
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            x = (np.resize(np.frombuffer(payload, np.uint8), 1600).astype(
                np.float64
            ) - 128.0) / 128.0
            m = np.abs(np.fft.rfft(x))[1:]
            tot = float(m.sum())
            if tot == 0.0:
                seen[key] = (0.0, 0.0, 0.0)
                continue
            dom = float(freqs[int(np.argmax(m))])
            cen = float((freqs * m).sum() / tot)
            e = m * m
            hf = float(e[freqs > 1000.0].sum() / e.sum())
            seen[key] = (dom, cen, hf)
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "sample_rate": pa.array([8000] * len(keys), pa.int32()),
            "n_samples": pa.array([1600] * len(keys), pa.int64()),
            "dominant_hz": pa.array([seen[k][0] for k in keys], pa.float64()),
            "spectral_centroid_hz": pa.array([seen[k][1] for k in keys], pa.float64()),
            "hf_energy_ratio": pa.array([seen[k][2] for k in keys], pa.float64()),
        }
    )


def x68_mp4_golden() -> pa.Table:
    """Recompute the x68 MP4-metadata expectation per distinct document
    payload WITHOUT the box parser: the query builds the container from
    pure byte arithmetic (width = 160 + first byte, height = 90 + last
    byte, duration = 1 s + 40 ms/byte at timescale 1000, one 'vide'
    track, brand 'isom'), so the expectation comes straight from the
    bytes — a box-walk mis-parse anywhere diverges. Keyed by
    sha256(text)."""
    cols: dict[str, list] = {k: [] for k in (
        "sha256", "major_brand", "timescale", "duration_sec",
        "n_tracks", "track_types", "width", "height",
    )}
    seen: set[str] = set()
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            seen.add(key)
            cols["sha256"].append(key)
            cols["major_brand"].append("isom")
            cols["timescale"].append(1000)
            cols["duration_sec"].append((1000 + 40 * len(payload)) / 1000.0)
            cols["n_tracks"].append(1)
            cols["track_types"].append("vide")
            cols["width"].append(float(160 + payload[0]))
            cols["height"].append(float(90 + payload[-1]))
    order = np.argsort(cols["sha256"])
    return pa.table(
        {
            "sha256": pa.array([cols["sha256"][i] for i in order], pa.string()),
            "major_brand": pa.array([cols["major_brand"][i] for i in order], pa.string()),
            "timescale": pa.array([cols["timescale"][i] for i in order], pa.int32()),
            "duration_sec": pa.array([cols["duration_sec"][i] for i in order], pa.float64()),
            "n_tracks": pa.array([cols["n_tracks"][i] for i in order], pa.int32()),
            "track_types": pa.array([cols["track_types"][i] for i in order], pa.string()),
            "width": pa.array([cols["width"][i] for i in order], pa.float64()),
            "height": pa.array([cols["height"][i] for i in order], pa.float64()),
        }
    )


def x69_compression_golden() -> pa.Table:
    """Per-distinct-document zlib(level 6) deflate size — deterministic
    for the pinned zlib build — alongside the raw utf-8 byte count.
    The x69 oracle recomputes ratio/keep in SQL from these counts.
    Keyed by sha256(text)."""
    import zlib

    seen: dict[str, tuple[int, int]] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            data = text.encode("utf-8")
            seen[key] = (len(data), len(zlib.compress(data, 6)))
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "raw_bytes": pa.array([seen[k][0] for k in keys], pa.int64()),
            "compressed_bytes": pa.array([seen[k][1] for k in keys], pa.int64()),
        }
    )


def _independent_bpe(texts, num_merges: int = 8, min_pair_count: int = 2):
    """INDEPENDENT dict-based BPE trainer (the classic Sennrich et al.
    reference algorithm: Counter over the word-frequency table, greedy
    left-to-right merge application) — deliberately NOT importing
    operators/tokenizer.py, so the x70/x71 oracles pit two separate
    implementations of the same public algorithm against each other.
    Tie-break contract: highest weighted pair count, then lexicographic
    (left, right).  Returns ([(rank, left, right, count)], vocab) with
    ``vocab`` the post-merge word → symbol-list map (the word-cache an
    independent ENCODER needs: every corpus word's encoding is its
    final vocab entry)."""
    from collections import Counter

    wc: Counter = Counter()
    for text in texts:
        for w in _TOKEN_WS.split(text.lower()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (l_, r_), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l_ and syms[i + 1] == r_:
                    out.append(l_ + r_)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
        merges.append((rank, l_, r_, cnt))
    return merges, vocab


def _independent_bpe_batched(
    texts, num_merges: int = 8, min_pair_count: int = 2, batch: int = 3
):
    """INDEPENDENT dict-based trainer for the round-9 BATCHED merge
    schedule (``bpe_train(merge_batch=B)``): per round, rank all pairs
    by (count DESC, left, right), keep the top ``8*batch`` and apply up
    to ``batch`` pairwise symbol-DISJOINT merges front-of-ranking —
    disjoint merges cannot change each other's pair counts, so every
    recorded count is exact.  Deliberately NOT importing
    operators/tokenizer.py (the x94 oracle pits two implementations of
    the same documented schedule against each other)."""
    from collections import Counter

    wc: Counter = Counter()
    for text in texts:
        for w in _TOKEN_WS.split(text.lower()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        budget = min(batch, num_merges - len(merges))
        ranked = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: (budget if budget == 1 else 8 * budget)]
        picked, used = [], set()
        for (l_, r_), cnt in ranked:
            if len(picked) >= budget:
                break
            if cnt < min_pair_count:
                if not picked:
                    break
                continue
            if l_ in used or r_ in used or (l_ + r_) in used:
                continue
            picked.append((l_, r_, cnt))
            used.update((l_, r_, l_ + r_))
        if not picked:
            break
        for l_, r_, cnt in picked:
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l_ and syms[i + 1] == r_:
                        out.append(l_ + r_)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
            merges.append((len(merges) + 1, l_, r_, cnt))
    return merges, vocab


def x94_bpe_batched_golden() -> pa.Table:
    """Batched-schedule merge table (batch=3) learned by
    ``_independent_bpe_batched`` per sf dir, keyed by corpus_key =
    DuckDB bit_xor(hash(doc_id, text)) over the documents view (the
    x70 pattern)."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "rank", "left", "right", "pair_count",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["text"])
        merges, _ = _independent_bpe_batched(docs.column("text").to_pylist())
        for rank, l_, r_, cnt in merges:
            cols["corpus_key"].append(int(key))
            cols["rank"].append(rank)
            cols["left"].append(l_)
            cols["right"].append(r_)
            cols["pair_count"].append(cnt)
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "rank": pa.array(cols["rank"], pa.int32()),
            "left": pa.array(cols["left"], pa.string()),
            "right": pa.array(cols["right"], pa.string()),
            "pair_count": pa.array(cols["pair_count"], pa.int64()),
        }
    )


def _independent_unigram(
    texts: list[str],
    seed_multi: int = 48,
    vocab_size: int = 32,
    num_iters: int = 2,
    max_piece_len: int = 4,
):
    """Dict-based unigram-LM trainer (Kudo 2018 EM over the
    word-frequency table) following the determinism spec in
    operators/tokenizer.py:unigram_train — same seed rule, loop order,
    integer-micro staging and tie-breaks, entirely separate machinery
    (dict scans instead of Spark explodes/aggregations)."""
    from collections import Counter

    wc: Counter[str] = Counter()
    for t in texts:
        wc.update(w for w in _TOKEN_WS.split(t.lower()) if w)

    seed_counts: Counter[str] = Counter()
    for w, c in wc.items():
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                seed_counts[w[i : i + ln]] += c
    singles = {p: c for p, c in seed_counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in seed_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_multi]
    seed = dict(singles)
    seed.update(dict(multis))
    total = sum(seed.values())
    probs = {p: c / total for p, c in seed.items()}

    cm: dict[str, int] = {}
    for _ in range(num_iters):
        max_l = max(len(p) for p in probs)
        cm = {}
        for w, c in wc.items():
            n = len(w)
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for i in range(1, n + 1):
                a = 0.0
                for j in range(max(0, i - max_l), i):
                    p = probs.get(w[j:i])
                    if p is not None:
                        a += alpha[j] * p
                alpha[i] = a
            if alpha[n] <= 0.0:
                continue
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for j in range(n - 1, -1, -1):
                b = 0.0
                for i in range(j + 1, min(n, j + max_l) + 1):
                    p = probs.get(w[j:i])
                    if p is not None:
                        b += p * beta[i]
                beta[j] = b
            exp: dict[str, float] = {}
            for j in range(n):
                for i in range(j + 1, min(n, j + max_l) + 1):
                    piece = w[j:i]
                    p = probs.get(piece)
                    if p is not None:
                        exp[piece] = exp.get(piece, 0.0) + (
                            alpha[j] * p * beta[i] / alpha[n]
                        )
            for piece, e in exp.items():
                m = round(e * 1_000_000)
                if m:
                    cm[piece] = cm.get(piece, 0) + m * c
        tot = sum(cm.values())
        probs = {p: c / tot for p, c in cm.items()}

    final = sorted(cm.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    tot_f = sum(cm.values())
    return [
        (rank + 1, piece, c, round(c / tot_f, 6))
        for rank, (piece, c) in enumerate(final)
    ]


def x77_unigram_golden() -> pa.Table:
    """Unigram-LM vocabulary learned by ``_independent_unigram`` per sf
    dir, keyed by corpus_key = DuckDB bit_xor(hash(doc_id, text)) over
    the documents view (the x70 pattern)."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "rank", "piece", "count_micro", "prob",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["text"])
        for rank, piece, c, prob in _independent_unigram(
            docs.column("text").to_pylist()
        ):
            cols["corpus_key"].append(int(key))
            cols["rank"].append(rank)
            cols["piece"].append(piece)
            cols["count_micro"].append(c)
            cols["prob"].append(prob)
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "rank": pa.array(cols["rank"], pa.int32()),
            "piece": pa.array(cols["piece"], pa.string()),
            "count_micro": pa.array(cols["count_micro"], pa.int64()),
            "prob": pa.array(cols["prob"], pa.float64()),
        }
    )


def x70_bpe_golden() -> pa.Table:
    """Merge table learned by ``_independent_bpe`` per sf dir, keyed by
    corpus_key = DuckDB bit_xor(hash(doc_id, text)) over the documents
    view."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "rank", "left", "right", "pair_count",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["text"])
        merges, _ = _independent_bpe(docs.column("text").to_pylist())
        for rank, l_, r_, cnt in merges:
            cols["corpus_key"].append(int(key))
            cols["rank"].append(rank)
            cols["left"].append(l_)
            cols["right"].append(r_)
            cols["pair_count"].append(cnt)
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "rank": pa.array(cols["rank"], pa.int32()),
            "left": pa.array(cols["left"], pa.string()),
            "right": pa.array(cols["right"], pa.string()),
            "pair_count": pa.array(cols["pair_count"], pa.int64()),
        }
    )


def x71_bpe_encode_golden() -> pa.Table:
    """Per-document BPE ENCODE expectation from the independent trainer:
    after ``_independent_bpe`` converges, every corpus word's encoding
    is its final vocab entry, so each document's token stream is the
    concatenation of its words' vocab symbol lists (same greedy
    rank-order contract as operators/tokenizer.py:bpe_encode, reached
    by entirely separate code).  One row per (corpus_key, doc_id) with
    n_words / n_tokens / the first-10-token preview."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "doc_id", "n_words", "n_tokens", "tokens_preview",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["doc_id", "text"])
        texts = docs.column("text").to_pylist()
        _, vocab = _independent_bpe(texts)
        for doc_id, text in zip(docs.column("doc_id").to_pylist(), texts):
            words = [w for w in _TOKEN_WS.split(text.lower()) if w]
            toks: list[str] = []
            for w in words:
                toks.extend(vocab[w])
            cols["corpus_key"].append(int(key))
            cols["doc_id"].append(int(doc_id))
            cols["n_words"].append(len(words))
            cols["n_tokens"].append(len(toks))
            cols["tokens_preview"].append(" ".join(toks[:10]))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_words": pa.array(cols["n_words"], pa.int64()),
            "n_tokens": pa.array(cols["n_tokens"], pa.int64()),
            "tokens_preview": pa.array(cols["tokens_preview"], pa.string()),
        }
    )


def _viterbi_segment(w: str, counts: dict[str, int]) -> list[str]:
    """Maximum-likelihood segmentation under the unigram model — the
    determinism spec of operators/tokenizer.py:unigram_encode (scores
    log(count)-log(total), j ascending, strict >, single-char OOV
    fallback at -1e9)."""
    import math

    total = sum(counts.values())
    log_tot = math.log(total)
    logp = {p: math.log(c) - log_tot for p, c in counts.items()}
    max_l = max(len(p) for p in logp)
    n = len(w)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_l), i):
            piece = w[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = -1e9
                else:
                    continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(w[j:i])
        i = j
    return pieces[::-1]


def x78_unigram_encode_golden() -> pa.Table:
    """Per-document unigram-LM ENCODE expectation: train with the
    independent EM (``_independent_unigram``, full seed/vocab defaults —
    the x77 model), then Viterbi-segment every word with the shared
    determinism spec. One row per (corpus_key, doc_id) with n_words /
    n_pieces / the first-10-piece preview (the x71 shape)."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "doc_id", "n_words", "n_pieces", "pieces_preview",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["doc_id", "text"])
        texts = docs.column("text").to_pylist()
        counts = {
            piece: c for _, piece, c, _ in _independent_unigram(texts)
        }
        memo: dict[str, list[str]] = {}
        for doc_id, text in zip(docs.column("doc_id").to_pylist(), texts):
            words = [w for w in _TOKEN_WS.split(text.lower()) if w]
            pieces: list[str] = []
            for w in words:
                if w not in memo:
                    memo[w] = _viterbi_segment(w, counts)
                pieces.extend(memo[w])
            cols["corpus_key"].append(int(key))
            cols["doc_id"].append(int(doc_id))
            cols["n_words"].append(len(words))
            cols["n_pieces"].append(len(pieces))
            cols["pieces_preview"].append(" ".join(pieces[:10]))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_words": pa.array(cols["n_words"], pa.int64()),
            "n_pieces": pa.array(cols["n_pieces"], pa.int64()),
            "pieces_preview": pa.array(cols["pieces_preview"], pa.string()),
        }
    )


def x79_dhash_golden() -> pa.Table:
    """Recompute the x79 difference hash per distinct document payload
    WITHOUT the PNG codec or the Spark hash path: the query tiles the
    text's utf-8 bytes into an 8×9 grayscale image (exact PNG
    round-trip), so the dHash is pure byte arithmetic — bit r*8+c (MSB
    first) iff byte[r][c] > byte[r][c+1], emitted as a signed 64-bit
    value. Keyed by sha256(text)."""
    seen: dict[str, int] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            data = text.encode("utf-8") or b"\x00"
            gray = np.resize(np.frombuffer(data, np.uint8), (8, 9)).astype(
                np.float64
            )
            bits = gray[:, :-1] > gray[:, 1:]
            v = 0
            for bit in bits.ravel():
                v = (v << 1) | int(bit)
            seen[key] = v - (1 << 64) if v >= (1 << 63) else v
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "dhash": pa.array([seen[k] for k in keys], pa.int64()),
        }
    )


def x80_audio_fp_golden() -> pa.Table:
    """Recompute the x80 spectral audio fingerprint per distinct
    document payload WITHOUT the wave codec: the dyadic byte→sample
    mapping round-trips PCM16 exactly, so the fingerprint is the same
    fixed numpy sequence audio_fingerprint runs — 8 frames × rFFT →
    9 band energies (DC dropped) → sign-of-difference bits, MSB first,
    signed 64-bit. Keyed by sha256(text)."""
    n_frames, n_bands = 8, 9
    seen: dict[str, int] = {}
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            data = text.encode("utf-8") or b"\x00"
            x = (
                np.resize(np.frombuffer(data, np.uint8), 1600).astype(np.float64)
                - 128.0
            ) / 128.0
            per = x.size // n_frames
            frames = x[: n_frames * per].reshape(n_frames, per)
            mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]
            nb = mag.shape[1]
            edges = (np.arange(n_bands + 1) * nb) // n_bands
            bands = np.stack(
                [
                    (mag[:, edges[k] : edges[k + 1]] ** 2).sum(axis=1)
                    for k in range(n_bands)
                ],
                axis=1,
            )
            bits = bands[:, :-1] > bands[:, 1:]
            v = 0
            for bit in bits.ravel():
                v = (v << 1) | int(bit)
            seen[key] = v - (1 << 64) if v >= (1 << 63) else v
    keys = sorted(seen)
    return pa.table(
        {
            "sha256": pa.array(keys, pa.string()),
            "afp": pa.array([seen[k] for k in keys], pa.int64()),
        }
    )


def x64_gif_golden() -> pa.Table:
    """Recompute the x64 REAL-GIF-frame expectation per distinct document
    payload WITHOUT the GIF codec: the query tiles the text's utf-8 bytes
    into three 6×8 frames under an identity grayscale palette, encodes a
    real animated GIF (giflite) and samples all three frames back through
    LZW decode + palette + compositing. Palette identity makes each
    frame's mean equal the mean of its byte window — pure arithmetic, so
    a codec mis-parse anywhere diverges. Keyed by sha256(text); 3 rows
    per digest."""
    cols: dict[str, list] = {k: [] for k in (
        "sha256", "frame_idx", "height", "width", "delay_cs", "mean_pixel"
    )}
    seen: set[str] = set()
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            seen.add(key)
            tiled = np.resize(np.frombuffer(payload, np.uint8), 3 * 48)
            for fi in range(3):
                frame = tiled[fi * 48 : (fi + 1) * 48]
                cols["sha256"].append(key)
                cols["frame_idx"].append(fi)
                cols["height"].append(6)
                cols["width"].append(8)
                cols["delay_cs"].append(7)
                cols["mean_pixel"].append(float(frame.astype(np.float64).mean()))
    return pa.table(
        {
            "sha256": pa.array(cols["sha256"], pa.string()),
            "frame_idx": pa.array(cols["frame_idx"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "width": pa.array(cols["width"], pa.int32()),
            "delay_cs": pa.array(cols["delay_cs"], pa.int32()),
            "mean_pixel": pa.array(cols["mean_pixel"], pa.float64()),
        }
    )


def x73_avi_golden() -> pa.Table:
    """Recompute the x73 REAL-VIDEO-frame expectation per distinct
    document payload WITHOUT either codec involved: the query tiles the
    text's utf-8 bytes (cyclic, &0xFE) into three 16×16 frames of
    constant even-valued 8×8 blocks — jpeglite's exact quality-50
    subspace (see x65) — encodes each as baseline JPEG, wraps all three
    in a real AVI/MJPEG container (avilite) and samples them back
    through the RIFF walk + Huffman/IDCT decode. Exactness makes each
    frame's mean the mean of its four block bytes — pure arithmetic; a
    mis-parse in EITHER the container walk or the JPEG entropy decode
    diverges. Keyed by sha256(text); 3 rows per digest."""
    cols: dict[str, list] = {k: [] for k in (
        "sha256", "frame_idx", "height", "width", "fps", "mean_pixel"
    )}
    seen: set[str] = set()
    for sf in SF_DIRS:
        docs = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
        for text in docs.column("text").to_pylist():
            payload = text.encode("utf-8") or b"\x00"
            key = hashlib.sha256(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            seen.add(key)
            tiled = np.resize(np.frombuffer(payload, np.uint8), 3 * 4) & 0xFE
            for fi in range(3):
                vals = tiled[fi * 4 : (fi + 1) * 4]
                cols["sha256"].append(key)
                cols["frame_idx"].append(fi)
                cols["height"].append(16)
                cols["width"].append(16)
                cols["fps"].append(24.0)
                cols["mean_pixel"].append(float(vals.astype(np.float64).mean()))
    return pa.table(
        {
            "sha256": pa.array(cols["sha256"], pa.string()),
            "frame_idx": pa.array(cols["frame_idx"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "width": pa.array(cols["width"], pa.int32()),
            "fps": pa.array(cols["fps"], pa.float64()),
            "mean_pixel": pa.array(cols["mean_pixel"], pa.float64()),
        }
    )


def xxh64_int(i: int, seed: int) -> int:
    """Spark's 4-byte (IntegerType) hash step — the scalar form of
    ``xxh64_int_vec_seeded`` (xxhash64(<col>, lit(i)) remixes)."""
    h = (seed + _XP5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _XP1) & _M64
    h = (_xrotl(h, 23) * _XP2 + _XP3) & _M64
    return _xfmix(h)


def _bloom_positions(gram: str, k_hashes: int, m_bits: int) -> list[int]:
    """pmod(xxhash64(gram, i), m_bits) for i in [0, k) — replicating the
    Spark expression chain with the independent XXH64 (string path
    seeded 42, then the IntegerType step; signed pmod)."""
    r1 = xxh64_bytes(gram.encode("utf-8"), 42)
    out = []
    for i in range(k_hashes):
        h = xxh64_int(i, r1)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        out.append(signed % m_bits)
    return out


def x76_bloom_golden() -> pa.Table:
    """Independently re-derive the x76 bloom-decontamination flags per
    sf dir (benchmark = doc_id % 23 == 0, word 3-grams, m=2^18 bits,
    k=3 hashes): a dict/set bloom build + probe over the SAME hash
    chain recomputed by the pure-Python XXH64 above (proven equal to
    Spark's xxhash64 in tests/test_golden_hash_parity.py). Bloom
    membership is exact set arithmetic — no float jitter — so the two
    implementations must agree bit-for-bit, false positives included.
    Keyed by corpus_key (recomputed inside the oracle SQL)."""
    n, m_bits, k_hashes = 3, 1 << 18, 3
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "doc_id", "n_grams", "n_flagged", "flagged",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["doc_id", "text"]).to_pylist()

        def grams_of(text: str) -> set[str]:
            toks = [t for t in _TOKEN_WS.split(text.lower()) if t]
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }

        bits: set[int] = set()
        for r in docs:
            if r["doc_id"] % 23 == 0:
                for g in grams_of(r["text"]):
                    bits.update(_bloom_positions(g, k_hashes, m_bits))
        for r in docs:
            if r["doc_id"] % 23 == 0:
                continue
            gs = grams_of(r["text"])
            if not gs:
                continue  # gram-less docs never enter the screen
            flagged = sum(
                1
                for g in gs
                if all(
                    pos in bits for pos in _bloom_positions(g, k_hashes, m_bits)
                )
            )
            cols["corpus_key"].append(int(key))
            cols["doc_id"].append(r["doc_id"])
            cols["n_grams"].append(len(gs))
            cols["n_flagged"].append(flagged)
            cols["flagged"].append(flagged > 0)
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_grams": pa.array(cols["n_grams"], pa.int64()),
            "n_flagged": pa.array(cols["n_flagged"], pa.int64()),
            "flagged": pa.array(cols["flagged"], pa.bool_()),
        }
    )


def x75_kmeans_golden() -> pa.Table:
    """Independently re-derive the x75 DISTRIBUTED k-means model per sf
    dir: same spec as operators/similarity.kmeans_train (init = k
    smallest vec_ids, 5 Lloyd iterations, EXACT-INTEGER centroid
    quantization to 3 decimals after init and after every update,
    empty cluster keeps its centroid, sizes from a final assignment
    pass) but a separate loop-based implementation: per-point loops
    and plain Python integer accumulation instead of a Spark
    aggregation. Both implementations share the direct ``||x-c||**2``
    assignment form BY CONTRACT (the expanded ``||c||^2 - 2 x.c`` form
    rounds differently on near-ties and must not be introduced on
    either side). Determinism contract (round 7, after the round-6
    driver hash-fail proved rounding a float sum is not
    layout-invariant): each coordinate is quantized element-wise to
    integer micros ``floor(x*1e6 + 0.5)``, sums are exact integers,
    and the new centroid is ``(2*s + n*sub) // (2*n*sub)`` grid units
    (sub = 1000 for q=3), i.e. round-half-up in pure integer
    arithmetic — bit-identical regardless of partition layout or
    summation order on both sides. Keyed by corpus_key (recomputed
    inside the oracle SQL)."""
    con = duckdb.connect()
    cols = {"corpus_key": [], "list_id": [], "size": [], "pos": [], "val": []}
    k, iters, q = 8, 5, 3
    scale = 10 ** q
    sub = 10 ** (6 - q)
    for sf in SF_DIRS:
        path = os.path.join(sf, "embeddings.parquet")
        key = int(con.execute(CORPUS_KEY_SQL, [path]).fetchone()[0])
        emb = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
        emb = emb.sort_values("vec_id")
        vecs = [np.asarray(e, dtype=np.float64) for e in emb["embedding"]]
        micros = [
            [math.floor(float(v) * 1_000_000.0 + 0.5) for v in x] for x in vecs
        ]
        cents_q = [
            [math.floor(float(v) * scale + 0.5) for v in x] for x in vecs[:k]
        ]

        def cents_f():
            return [np.array(c, dtype=np.float64) / scale for c in cents_q]

        def nearest(x, cents):
            best, bd = 0, None
            for ci, c in enumerate(cents):
                dd = float(((x - c) ** 2).sum())
                if bd is None or dd < bd:
                    best, bd = ci, dd
            return best

        for _ in range(iters):
            cents = cents_f()
            sums = [[0] * len(cents_q[0]) for _ in range(k)]
            counts = [0] * k
            for x, xm in zip(vecs, micros):
                ci = nearest(x, cents)
                sums[ci] = [s + m for s, m in zip(sums[ci], xm)]
                counts[ci] += 1
            for ci in range(k):
                if counts[ci]:
                    den = counts[ci] * sub
                    cents_q[ci] = [
                        (2 * s + den) // (2 * den) for s in sums[ci]
                    ]
        cents = cents_f()
        sizes = [0] * k
        for x in vecs:
            sizes[nearest(x, cents)] += 1
        for ci in range(k):
            for pos, val in enumerate(cents[ci]):
                cols["corpus_key"].append(key)
                cols["list_id"].append(ci)
                cols["size"].append(sizes[ci])
                cols["pos"].append(pos)
                cols["val"].append(float(val))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "list_id": pa.array(cols["list_id"], pa.int32()),
            "size": pa.array(cols["size"], pa.int64()),
            "pos": pa.array(cols["pos"], pa.int32()),
            "val": pa.array(cols["val"], pa.float64()),
        }
    )


def x9_centroid_golden() -> pa.Table:
    """Fit the x9 centroids per sf dir with the shared numpy core on the
    vec_id-ordered sample; emit (corpus_key, list_id, pos, val) rows."""
    con = duckdb.connect()
    cols = {"corpus_key": [], "list_id": [], "pos": [], "val": []}
    for sf in SF_DIRS:
        path = os.path.join(sf, "embeddings.parquet")
        key = int(con.execute(CORPUS_KEY_SQL, [path]).fetchone()[0])
        emb = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
        emb = emb.sort_values("vec_id").head(2000)
        sample = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        cents = lloyd_kmeans(sample, nlist=8, iters=10, seed=5)
        for li, cent in enumerate(cents):
            for pos, val in enumerate(cent):
                cols["corpus_key"].append(key)
                cols["list_id"].append(li)
                cols["pos"].append(pos)
                cols["val"].append(float(val))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "list_id": pa.array(cols["list_id"], pa.int32()),
            "pos": pa.array(cols["pos"], pa.int32()),
            "val": pa.array(cols["val"], pa.float64()),
        }
    )


def x103_pca_basis_golden() -> pa.Table:
    """Independently-computed PCA/whitening basis per embeddings corpus
    (round 10, the x103 oracle's literal projection matrix): DuckDB
    quantizes and integer-sums the covariance statistics exactly as the
    x100 oracle does (proven equal to the Spark pipeline by x100's
    record), arbitrary-precision Python/numpy assembles the covariance
    and eigendecomposes it, and the top-k whitened axes are quantized
    to int64 — the same 1e-6 model quantization `pca_basis` applies, so
    sub-1e-9 eigensolver jitter cannot diverge the two.  The honest
    scope: the EIGENSOLVER is numpy on both sides (a d x d dense eig is
    driver-side math, not engine work); what the oracle independently
    verifies is the covariance pipeline, the quantized model, and the
    distributed map-only projection.  Keyed by corpus_key = DuckDB
    bit_xor(hash(vec_id, embedding)) (the x9/x75 convention)."""
    dim, k, quant = 64, 8, 10**6
    cols: dict[str, list] = {
        "corpus_key": [], "comp": [], "j": [],
        "wq": [], "offset_c": [], "eigval": [],
    }
    for sf in SF_DIRS:
        p = os.path.join(sf, "embeddings.parquet")
        key = duckdb.sql(
            "SELECT bit_xor(hash(vec_id, embedding::DOUBLE[]::VARCHAR)) "
            f"FROM read_parquet('{p}')"
        ).fetchone()[0]
        grid = duckdb.sql(
            f"""
            WITH q AS (
              SELECT list_transform(embedding::DOUBLE[],
                                    v -> CAST(round(v * 1000000.0) AS BIGINT)) AS qv
              FROM read_parquet('{p}')
              WHERE embedding IS NOT NULL AND len(embedding) = {dim}
            ), pr AS (
              SELECT ii.i - 1 AS i, jj.j - 1 AS j, qv[ii.i] AS x, qv[jj.j] AS y
              FROM q
              CROSS JOIN LATERAL unnest(generate_series(1, {dim})) AS ii(i)
              CROSS JOIN LATERAL unnest(generate_series(1, {dim})) AS jj(j)
              WHERE jj.j >= ii.i
            )
            SELECT i, j, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM pr GROUP BY 1, 2
            """
        ).fetchall()
        n = None
        m = np.zeros((dim, dim), dtype=np.float64)
        sx = [0] * dim
        for i, j, nn, sxi, syj, sxy in grid:
            # mirror the Spark/x100 float order exactly:
            # ((sxy - sx*sy/n)/n)/quant^2 with each operand cast first
            cov = (
                (float(sxy) - float(sxi) * float(syj) / float(nn))
                / float(nn)
            ) / float(quant * quant)
            m[i][j] = m[j][i] = cov
            if i == j:
                sx[i] = int(sxi)
            n = int(nn)
        evals, evecs = np.linalg.eigh(m)
        for c in range(k):
            idx = dim - 1 - c  # descending eigenvalue
            lam = float(evals[idx])
            v = evecs[:, idx].copy()
            if v[int(np.argmax(np.abs(v)))] < 0:
                v = -v
            v = v / math.sqrt(lam)  # whiten (x103 fits whiten=True)
            wq = np.round(v * quant).astype(np.int64)
            b = sum(int(wq[j]) * sx[j] for j in range(dim))
            off = b / (n * quant * quant)
            for j in range(dim):
                cols["corpus_key"].append(int(key))
                cols["comp"].append(c)
                cols["j"].append(j)
                cols["wq"].append(int(wq[j]))
                cols["offset_c"].append(off)
                cols["eigval"].append(lam)
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "comp": pa.array(cols["comp"], pa.int32()),
            "j": pa.array(cols["j"], pa.int32()),
            "wq": pa.array(cols["wq"], pa.int64()),
            "offset_c": pa.array(cols["offset_c"], pa.float64()),
            "eigval": pa.array(cols["eigval"], pa.float64()),
        }
    )


def x56_codebook_golden() -> pa.Table:
    """Fit the x56 PQ codebooks per sf dir (m=8, k=16, iters=10, seed=5 on
    the vec_id-ordered 2000-row sample — exactly what _q_x56_pq_codes fits
    at runtime via pq_fit_sample, imported above so the floats are
    bit-identical); emit (corpus_key, sub, code, pos, val) rows."""
    con = duckdb.connect()
    cols = {"corpus_key": [], "sub": [], "code": [], "pos": [], "val": []}
    for sf in SF_DIRS:
        path = os.path.join(sf, "embeddings.parquet")
        key = int(con.execute(CORPUS_KEY_SQL, [path]).fetchone()[0])
        emb = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
        emb = emb.sort_values("vec_id").head(2000)
        sample = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        books = pq_fit_sample(sample, m=8, k=16, iters=10, seed=5)
        for sub in range(books.shape[0]):
            for code in range(books.shape[1]):
                for pos, val in enumerate(books[sub, code]):
                    cols["corpus_key"].append(key)
                    cols["sub"].append(sub)
                    cols["code"].append(code)
                    cols["pos"].append(pos)
                    cols["val"].append(float(val))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "sub": pa.array(cols["sub"], pa.int32()),
            "code": pa.array(cols["code"], pa.int32()),
            "pos": pa.array(cols["pos"], pa.int32()),
            "val": pa.array(cols["val"], pa.float64()),
        }
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    x11 = x11_decode_golden()
    pq.write_table(x11, os.path.join(OUT_DIR, "x11_decode.parquet"))
    print(f"x11_decode.parquet: {x11.num_rows} distinct payloads")
    x61 = x61_png_golden()
    pq.write_table(x61, os.path.join(OUT_DIR, "x61_png_decode.parquet"))
    print(f"x61_png_decode.parquet: {x61.num_rows} distinct payloads")
    x64 = x64_gif_golden()
    pq.write_table(x64, os.path.join(OUT_DIR, "x64_gif_frames.parquet"))
    print(f"x64_gif_frames.parquet: {x64.num_rows} rows")
    r9b = r9b_approx_distinct_golden()
    pq.write_table(r9b, os.path.join(OUT_DIR, "r9b_approx_distinct.parquet"))
    print(f"r9b_approx_distinct.parquet: {r9b.num_rows} rows")
    x5 = x5_minhash_golden()
    pq.write_table(x5, os.path.join(OUT_DIR, "x5_minhash.parquet"))
    print(f"x5_minhash.parquet: {x5.num_rows} distinct payloads")
    x95 = x95_cms_buckets_golden()
    pq.write_table(x95, os.path.join(OUT_DIR, "x95_cms_buckets.parquet"))
    print(f"x95_cms_buckets.parquet: {x95.num_rows} distinct terms")
    x6 = x6_simhash_golden()
    pq.write_table(x6, os.path.join(OUT_DIR, "x6_simhash.parquet"))
    print(f"x6_simhash.parquet: {x6.num_rows} distinct payloads")
    x65 = x65_jpeg_golden()
    pq.write_table(x65, os.path.join(OUT_DIR, "x65_jpeg_decode.parquet"))
    print(f"x65_jpeg_decode.parquet: {x65.num_rows} distinct payloads")
    x110 = x110_lossless_golden()
    pq.write_table(x110, os.path.join(OUT_DIR, "x110_lossless_decode.parquet"))
    print(f"x110_lossless_decode.parquet: {x110.num_rows} distinct payloads")
    x111 = x111_hll_golden()
    pq.write_table(x111, os.path.join(OUT_DIR, "x111_hll_registers.parquet"))
    print(f"x111_hll_registers.parquet: {x111.num_rows} distinct texts")
    x112 = x112_flac_golden()
    pq.write_table(x112, os.path.join(OUT_DIR, "x112_flac_decode.parquet"))
    print(f"x112_flac_decode.parquet: {x112.num_rows} distinct texts")
    x70 = x70_bpe_golden()
    pq.write_table(x70, os.path.join(OUT_DIR, "x70_bpe_merges.parquet"))
    print(f"x70_bpe_merges.parquet: {x70.num_rows} rows")
    x94 = x94_bpe_batched_golden()
    pq.write_table(x94, os.path.join(OUT_DIR, "x94_bpe_batched.parquet"))
    print(f"x94_bpe_batched.parquet: {x94.num_rows} rows")
    x71 = x71_bpe_encode_golden()
    pq.write_table(x71, os.path.join(OUT_DIR, "x71_bpe_encode.parquet"))
    print(f"x71_bpe_encode.parquet: {x71.num_rows} rows")
    x69 = x69_compression_golden()
    pq.write_table(x69, os.path.join(OUT_DIR, "x69_compression.parquet"))
    print(f"x69_compression.parquet: {x69.num_rows} distinct payloads")
    x68 = x68_mp4_golden()
    pq.write_table(x68, os.path.join(OUT_DIR, "x68_mp4_meta.parquet"))
    print(f"x68_mp4_meta.parquet: {x68.num_rows} distinct payloads")
    x67 = x67_wav_spectrum_golden()
    pq.write_table(x67, os.path.join(OUT_DIR, "x67_wav_spectrum.parquet"))
    print(f"x67_wav_spectrum.parquet: {x67.num_rows} distinct payloads")
    x62 = x62_wav_golden()
    pq.write_table(x62, os.path.join(OUT_DIR, "x62_wav_decode.parquet"))
    print(f"x62_wav_decode.parquet: {x62.num_rows} distinct payloads")
    x9 = x9_centroid_golden()
    pq.write_table(x9, os.path.join(OUT_DIR, "x9_centroids.parquet"))
    print(f"x9_centroids.parquet: {x9.num_rows} rows ({x9.num_rows // (8 * 64)} corpora)")
    x80 = x80_audio_fp_golden()
    pq.write_table(x80, os.path.join(OUT_DIR, "x80_audio_fp.parquet"))
    print(f"x80_audio_fp.parquet: {x80.num_rows} distinct payloads")
    x79 = x79_dhash_golden()
    pq.write_table(x79, os.path.join(OUT_DIR, "x79_dhash.parquet"))
    print(f"x79_dhash.parquet: {x79.num_rows} distinct payloads")
    x78 = x78_unigram_encode_golden()
    pq.write_table(x78, os.path.join(OUT_DIR, "x78_unigram_encode.parquet"))
    print(f"x78_unigram_encode.parquet: {x78.num_rows} rows")
    x77 = x77_unigram_golden()
    pq.write_table(x77, os.path.join(OUT_DIR, "x77_unigram.parquet"))
    print(f"x77_unigram.parquet: {x77.num_rows} rows")
    x76 = x76_bloom_golden()
    pq.write_table(x76, os.path.join(OUT_DIR, "x76_bloom.parquet"))
    print(f"x76_bloom.parquet: {x76.num_rows} rows")
    x75 = x75_kmeans_golden()
    pq.write_table(x75, os.path.join(OUT_DIR, "x75_kmeans.parquet"))
    print(f"x75_kmeans.parquet: {x75.num_rows} rows ({x75.num_rows // (8 * 64)} corpora)")
    x73 = x73_avi_golden()
    pq.write_table(x73, os.path.join(OUT_DIR, "x73_avi_frames.parquet"))
    print(f"x73_avi_frames.parquet: {x73.num_rows} rows")
    x56 = x56_codebook_golden()
    pq.write_table(x56, os.path.join(OUT_DIR, "x56_codebooks.parquet"))
    print(f"x56_codebooks.parquet: {x56.num_rows} rows ({x56.num_rows // (8 * 16 * 8)} corpora)")
    x90 = x90_wordpiece_golden()
    pq.write_table(x90, os.path.join(OUT_DIR, "x90_wordpiece.parquet"))
    print(f"x90_wordpiece.parquet: {x90.num_rows} rows")
    x91 = x91_wordpiece_encode_golden()
    pq.write_table(x91, os.path.join(OUT_DIR, "x91_wordpiece_encode.parquet"))
    print(f"x91_wordpiece_encode.parquet: {x91.num_rows} rows")
    x103 = x103_pca_basis_golden()
    pq.write_table(x103, os.path.join(OUT_DIR, "x103_pca_basis.parquet"))
    print(f"x103_pca_basis.parquet: {x103.num_rows} rows")




def _independent_wordpiece(texts, num_merges: int = 8, min_pair_count: int = 2):
    """INDEPENDENT dict-based WordPiece trainer (the BERT vocabulary
    algorithm: iterative merges argmaxing the likelihood score
    ``count(l,r) / (count(l)*count(r))`` over ##-prefixed symbols) —
    deliberately NOT importing operators/tokenizer.py, so the x90/x91
    oracles pit two separate implementations of the same public
    algorithm against each other. Score contract mirrors the operator
    bit-for-bit: one IEEE division float(cnt)/(float(l)*float(r)),
    ties lexicographic on (left, right). Returns
    ([(rank, left, right, merged, cnt, l_cnt, r_cnt)], vocab)."""
    from collections import Counter

    wc: Counter = Counter()
    for text in texts:
        for w in _TOKEN_WS.split(text.lower()):
            if w:
                wc[w] += 1
    vocab = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for s in syms:
                uc[s] += n
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (l_, r_), cnt = min(
            pc.items(),
            key=lambda kv: (
                -(float(kv[1]) / (float(uc[kv[0][0]]) * float(uc[kv[0][1]]))),
                kv[0][0],
                kv[0][1],
            ),
        )
        if cnt < min_pair_count:
            break
        merged = l_ + (r_[2:] if r_.startswith("##") else r_)
        merges.append((rank, l_, r_, merged, cnt, uc[l_], uc[r_]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l_ and syms[i + 1] == r_:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _wordpiece_match(word: str, vocab: set, unk: str = "[UNK]") -> list:
    """BERT greedy longest-match-first; whole word -> [UNK] when stuck."""
    max_l = max(len(p) for p in vocab)
    out, i, n = [], 0, len(word)
    while i < n:
        j = min(n, i + (max_l if i == 0 else max_l - 2))
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else "##" + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        i = j
    return out


def x90_wordpiece_golden() -> pa.Table:
    """WordPiece merge table learned by ``_independent_wordpiece`` per
    sf dir, keyed by corpus_key (the x70 shape + merged/unit counts —
    all exact integers, no float ever reaches the compared values)."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "rank", "left", "right", "merged",
        "pair_count", "left_count", "right_count",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["text"])
        merges, _ = _independent_wordpiece(docs.column("text").to_pylist())
        for rank, l_, r_, merged, cnt, lc, rc in merges:
            cols["corpus_key"].append(int(key))
            cols["rank"].append(rank)
            cols["left"].append(l_)
            cols["right"].append(r_)
            cols["merged"].append(merged)
            cols["pair_count"].append(int(cnt))
            cols["left_count"].append(int(lc))
            cols["right_count"].append(int(rc))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "rank": pa.array(cols["rank"], pa.int32()),
            "left": pa.array(cols["left"], pa.string()),
            "right": pa.array(cols["right"], pa.string()),
            "merged": pa.array(cols["merged"], pa.string()),
            "pair_count": pa.array(cols["pair_count"], pa.int64()),
            "left_count": pa.array(cols["left_count"], pa.int64()),
            "right_count": pa.array(cols["right_count"], pa.int64()),
        }
    )


def x91_wordpiece_encode_golden() -> pa.Table:
    """Per-document WordPiece ENCODE expectation: train with the
    independent trainer (x90 model), derive the alphabet exactly as the
    operator does (first-char + ##continuation forms over corpus
    words), then greedy-longest-match every word (the x78 shape plus
    n_unk)."""
    cols: dict[str, list] = {k: [] for k in (
        "corpus_key", "doc_id", "n_words", "n_pieces", "n_unk",
        "pieces_preview",
    )}
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM read_parquet('{p}')"
        ).fetchone()[0]
        docs = pq.read_table(p, columns=["doc_id", "text"])
        texts = docs.column("text").to_pylist()
        merges, wvocab = _independent_wordpiece(texts)
        vocab = {m[3] for m in merges}
        for w in wvocab:
            vocab.add(w[0])
            vocab.update("##" + c for c in w[1:])
        memo: dict[str, list] = {}
        for doc_id, text in zip(docs.column("doc_id").to_pylist(), texts):
            words = [w for w in _TOKEN_WS.split(text.lower()) if w]
            pieces: list[str] = []
            for w in words:
                if w not in memo:
                    memo[w] = _wordpiece_match(w, vocab)
                pieces.extend(memo[w])
            cols["corpus_key"].append(int(key))
            cols["doc_id"].append(int(doc_id))
            cols["n_words"].append(len(words))
            cols["n_pieces"].append(len(pieces))
            cols["n_unk"].append(sum(1 for t in pieces if t == "[UNK]"))
            cols["pieces_preview"].append(" ".join(pieces[:10]))
    return pa.table(
        {
            "corpus_key": pa.array(cols["corpus_key"], pa.uint64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_words": pa.array(cols["n_words"], pa.int64()),
            "n_pieces": pa.array(cols["n_pieces"], pa.int64()),
            "n_unk": pa.array(cols["n_unk"], pa.int64()),
            "pieces_preview": pa.array(cols["pieces_preview"], pa.string()),
        }
    )

if __name__ == "__main__":
    main()
