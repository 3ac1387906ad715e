"""The x5/x6 goldens are only an INDEPENDENT oracle if the pure-Python
XXH64 in tools/make_goldens.py really equals Spark's xxhash64 expression
— this suite proves that equivalence (strings incl. >32-byte block path,
longs, int-seeded remixes, long chains) and the per-document
MinHash/SimHash recomputation against the live operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import dedup as D
from tools.make_goldens import (
    _minhash_doc,
    _simhash_doc,
    xxh64_bytes,
    xxh64_int_vec_seeded,
    xxh64_long,
    xxh64_long_vec,
)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


STRINGS = [
    "", "a", "abc", "hello", "12345678", "123456789",
    "a" * 31, "b" * 32, "c" * 33, "d" * 100,
    "héllo wörld ünïcode ﬃ", "tab\tsep", "emoji \U0001f600",
]
LONGS = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, -(2**63)]


def test_xxh64_string_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s STRING")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [_signed(xxh64_bytes(s.encode("utf-8"), 42)) for s in STRINGS]
    assert got == want


def test_xxh64_long_and_chain_parity(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v LONG")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [_signed(xxh64_long(v, 42)) for v in LONGS]
    # long chain (the _band_keys shape)
    got2 = [
        r[0]
        for r in df.select(
            F.xxhash64("v", (F.col("v") + 1).cast("long"), F.lit(3).cast("long"))
        ).collect()
    ]
    want2 = []
    for v in LONGS:
        h = xxh64_long(v, 42)
        h = xxh64_long((v + 1) & ((1 << 64) - 1), h)
        want2.append(_signed(xxh64_long(3, h)))
    assert got2 == want2


def test_xxh64_int_remix_parity(spark):
    """xxhash64(h, lit(i)) — IntegerType second arg takes the 4-byte
    path (the _remix family)."""
    df = spark.createDataFrame([(v,) for v in LONGS], "v LONG")
    for i in (0, 1, 17, 31):
        got = [r[0] for r in df.select(F.xxhash64("v", F.lit(i))).collect()]
        seeds = xxh64_long_vec(
            np.array(LONGS, dtype=np.int64).view(np.uint64), 42
        )
        want = [
            _signed(int(x)) for x in xxh64_int_vec_seeded(i, seeds)
        ]
        assert got == want, f"remix {i}"


def test_vectorized_matches_scalar():
    vs = np.array(LONGS, dtype=np.int64).view(np.uint64)
    vec = xxh64_long_vec(vs, 42)
    for v, got in zip(LONGS, vec):
        assert int(got) == xxh64_long(v, 42)


@pytest.mark.parametrize(
    "text",
    ["", "x", "  a  ", "hello world hello", "the quick brown fox " * 9,
     "a\tb\nc\x0bd\fe\rf"],
)
def test_minhash_doc_matches_operator(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    sigs = D.minhash_signatures(df, "text", "doc_id", 32, 5)
    row = sigs.collect()[0]
    banded = sigs.select(
        F.explode(D._band_keys(F.col("sig"), 8, 4)).alias("bk")
    ).collect()
    sh_g, bands_g = _minhash_doc(text)
    assert sorted(row["sh"]) == sh_g
    assert [b["bk"]["key"] for b in sorted(banded, key=lambda r: r["bk"]["band"])] == bands_g


@pytest.mark.parametrize(
    "text", ["", "x", "hello world hello", "a b c d e f g h " * 5]
)
def test_simhash_doc_matches_operator(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    got = df.select(D.simhash(F.col("text")).alias("s")).collect()[0]["s"]
    sh_g, chunks_g = _simhash_doc(text)
    assert got == sh_g
    assert chunks_g == [(sh_g >> (16 * c)) & 0xFFFF for c in range(4)]
