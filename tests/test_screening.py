"""Unit tests for corpus screening (repetition, decontamination), PII
scrub, and sequence packing — the x26–x29 contract operators."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.text import pii_scrub
from modis_aggregation_spark.operators import screening as S
from modis_aggregation_spark.operators.curation import pack_sequences


# ---------------------------------------------------------------- pii_scrub


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e.org now"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "call +1 555-867-5309 or (410) 555 0199."),
            (4, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (2, 0, 0)
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 2, 0)
    assert rows[2]["redacted"] == "server <IP> and <IP> up"
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (0, 0, 2)
    assert rows[3]["redacted"] == "call <PHONE> or <PHONE>."
    assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (0, 0, 0)
    assert rows[4]["redacted"] == "no pii here at all"


def test_pii_scrub_stage_order_prevents_double_count(spark):
    # the email local part and the IP both contain digit runs a phone
    # pattern would eat — staged redaction must count them exactly once
    df = spark.createDataFrame(
        [(1, "u12345@ex.com at 10.20.30.40 tel 555-123456")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).first()
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)
    assert r["redacted"] == "<EMAIL> at <IP> tel <PHONE>"


# ------------------------------------------------------------ pack_sequences


def _naive_pack(rows, L):
    out, pos = {}, 0
    for i, n in sorted(rows):
        start, end = pos, pos + n
        out[i] = (n, start // L, start % L, (end - 1) // L - start // L + 1)
        pos = end
    return out


@pytest.mark.parametrize("bucket", [2, 3, 1000])
def test_pack_sequences_matches_naive_cumsum(spark, bucket):
    rows = [(i, 7 * i % 23 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(
            df, "n", id_col="doc_id", seq_len=16, ids_per_bucket=bucket
        ).collect()
    }
    assert got == _naive_pack(rows, 16)


def test_pack_sequences_long_doc_spans_many(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 100), (2, 3)], "doc_id long, n long"
    )
    got = {r["id"]: r for r in pack_sequences(df, "n", seq_len=16, id_col="doc_id").collect()}
    assert got[1]["seq_id"] == 0 and got[1]["seq_offset"] == 5
    assert got[1]["n_seqs"] == (5 + 100 - 1) // 16 - 0 + 1  # ends in seq 6
    assert got[2]["seq_id"] == 105 // 16 and got[2]["seq_offset"] == 105 % 16


# -------------------------------------------------------- repetition_profile


def test_repetition_profile_values(spark):
    # "a b a b a b" : top 2-gram "a b" occurs 3×/5 grams, covers 6/6 tokens
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z q r")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in S.repetition_profile(df, top_ns=(2,), dup_n=2).collect()
    }
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["top2gram_frac"] == pytest.approx(3 * 2 / 6)
    # 5 bigram occurrences, 2 distinct -> dup frac 3/5
    assert rows[1]["dup2gram_frac"] == pytest.approx(1 - 2 / 5)
    assert rows[2]["top2gram_frac"] == pytest.approx(2 / 6)
    assert rows[2]["dup2gram_frac"] == 0.0


def test_repetition_profile_short_doc_null_metric(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "a")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in S.repetition_profile(df, top_ns=(2,), dup_n=5).collect()
    }
    # doc 1 has 2-grams but no 5-grams -> dup metric NULL
    assert rows[1]["top2gram_frac"] is not None
    assert rows[1]["dup5gram_frac"] is None
    # doc 2 has no grams for any n -> no output row (matches the oracle)
    assert 2 not in rows


# ------------------------------------------------------------- decontaminate


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated words appear here instead now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in S.decontaminate(train, bench, n=3).collect()}
    assert 1 in out and 2 not in out
    # shared 3-grams: "quick brown fox", "brown fox jumps"
    assert out[1]["n_hits"] == 2
    assert out[1]["n_grams"] == 7
    assert out[1]["contamination"] == pytest.approx(2 / 7)


def test_decontaminate_min_hits_threshold(spark):
    train = spark.createDataFrame(
        [(1, "one shared trigram lives right here only")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "one shared trigram")], "doc_id long, text string"
    )
    assert S.decontaminate(train, bench, n=3, min_hits=2).count() == 0
    assert S.decontaminate(train, bench, n=3, min_hits=1).count() == 1


def test_dsir_importance_prefers_target_domain(spark):
    from modis_aggregation_spark.operators.screening import dsir_importance

    rows = [
        (1, "alpha beam alpha beam alpha core"),
        (2, "alpha beam core alpha beam alpha"),
        (3, "zeta quux zeta quux zeta grind"),
        (4, "zeta grind quux zeta quux zeta"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.filter("doc_id <= 2")  # the alpha/beam domain
    got = {r["id"]: r for r in dsir_importance(docs, target).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(r["n_tokens"] == 6 for r in got.values())
    # target-domain docs must outscore off-domain docs
    assert min(got[1]["score_micro"], got[2]["score_micro"]) > max(
        got[3]["score_micro"], got[4]["score_micro"]
    )


def test_dsir_importance_score_is_exact_integer_sum(spark):
    import math

    from modis_aggregation_spark.operators.screening import dsir_importance

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
    )
    target = docs.filter("doc_id = 1")
    got = {r["id"]: r["score_micro"] for r in dsir_importance(docs, target).collect()}
    # hand-compute: raw counts a=2,b=2,c=1 (N_r=5,V=3); target a=2,b=1 (N_t=3)
    def lw(ct, cr):
        return round((math.log((ct + 1) / 6.0) - math.log((cr + 1) / 8.0)) * 1e6)
    assert got[1] == 2 * lw(2, 2) + lw(1, 2)
    assert got[2] == lw(1, 2) + lw(0, 1)


def test_compression_ratio_screen(spark):
    """zlib ratio screen: repetitive text compresses far below prose and
    is dropped; normal prose survives; empty text is ratio 0 (kept out
    by the lower bound); counts match stdlib zlib exactly."""
    import zlib

    from modis_aggregation_spark.operators.screening import (
        compression_ratio_screen,
    )

    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "wildly different sentences about satellites, glaciers and "
        "spectrometers keep the entropy of this paragraph honest."
    )
    junk = "spam " * 200
    df = spark.createDataFrame(
        [(1, prose), (2, junk), (3, "")], "doc_id LONG, text STRING"
    )
    out = {r["id"]: r for r in compression_ratio_screen(df).collect()}
    for i, t in ((1, prose), (2, junk)):
        data = t.encode("utf-8")
        assert out[i]["raw_bytes"] == len(data)
        assert out[i]["compressed_bytes"] == len(zlib.compress(data, 6))
    assert out[1]["keep"] is True and out[1]["ratio"] > 0.35
    assert out[2]["keep"] is False and out[2]["ratio"] < 0.1
    assert out[3]["raw_bytes"] == 0 and out[3]["keep"] is False


def test_bloom_screen_no_false_negatives_vs_exact(spark):
    """Every document the EXACT overlap check flags must also be bloom-
    flagged (bloom admits false positives, never negatives), and the
    per-doc flagged-gram count is >= the exact hit count."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "pack my box with")],
        "doc_id LONG, text STRING",
    )
    train = spark.createDataFrame(
        [
            (1, "a quick brown fox ran away"),      # shares "quick brown fox"
            (2, "pack my box with five dozen"),     # shares two grams
            (3, "entirely disjoint text sample z"), # no overlap
            (4, "xy"),                              # < n tokens: no grams
        ],
        "doc_id LONG, text STRING",
    )
    exact = {
        r["id"]: r["n_hits"]
        for r in S.decontaminate(train, bench, n=3, min_hits=1).collect()
    }
    bloom = {
        r["id"]: r
        for r in S.bloom_screen(train, bench, n=3).collect()
    }
    assert 4 not in bloom  # gram-less docs never enter the screen
    for did, hits in exact.items():
        assert bloom[did]["flagged"], did
        assert bloom[did]["n_flagged"] >= hits
    assert bloom[1]["flagged"] and bloom[2]["flagged"]
    # with 2^18 bits and a handful of grams, doc 3 should not collide
    assert not bloom[3]["flagged"]
    assert bloom[3]["n_flagged"] == 0 and bloom[3]["n_grams"] == 3


def test_bloom_bits_size_and_determinism(spark):
    bench = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven")],
        "doc_id LONG, text STRING",
    )
    bits1 = sorted(r["pos"] for r in S.bloom_bits(bench, n=3).collect())
    bits2 = sorted(
        r["pos"] for r in S.bloom_bits(bench.repartition(7), n=3).collect()
    )
    assert bits1 == bits2
    # 3 distinct grams ("one two three", "two three four", "five six seven")
    # x 3 hashes, minus any collisions
    assert 3 <= len(bits1) <= 9
    assert all(0 <= p < (1 << 18) for p in bits1)


def test_bloom_screen_tiny_filter_forces_false_positives(spark):
    """With m_bits=2 every probe lands on a set bit once the benchmark
    populates both — disjoint docs get flagged, demonstrating (and
    bounding) the documented FP behavior."""
    bench = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id LONG, text STRING"
    )
    train = spark.createDataFrame(
        [(2, "totally different words here now")], "doc_id LONG, text STRING"
    )
    out = S.bloom_screen(train, bench, n=3, m_bits=2, k_hashes=1).collect()
    assert out[0]["flagged"]


def test_heavy_hitters_exact_vs_naive(spark):
    """heavy_hitters must equal the naive full-shuffle groupBy + HAVING
    on the same corpus — including a term sitting just ABOVE the n/k
    threshold and one just BELOW it."""
    # 100 tokens total, k=10 -> threshold count > 10
    docs = [
        (1, " ".join(["hot"] * 11)),          # 11 > 10: heavy
        (2, " ".join(["edge"] * 10)),         # 10 is NOT > 10: excluded
        (3, " ".join(f"w{i}" for i in range(79))),  # 79 singletons
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        (r["term"], r["cnt"], r["n_tokens"])
        for r in S.heavy_hitters(df, "text", k=10).collect()
    }
    assert got == {("hot", 11, 100)}


def test_heavy_hitters_layout_invariant(spark):
    """The candidate set is layout-dependent (per-partition Misra-Gries)
    but the OUTPUT must not be: exact recount + threshold filter under
    1, 7, and 32 partitions."""
    rng = __import__("numpy").random.default_rng(5)
    words = [f"t{i}" for i in range(50)]
    # skewed corpus: "alpha" (5/doc) and "beta" (3/doc) clear the n/20
    # threshold; the 50-word uniform tail stays far below it
    docs = [
        (
            i,
            " ".join(
                ["alpha"] * 5 + ["beta"] * 3
                + list(rng.choice(words, size=32))
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    outs = []
    for parts in (1, 7, 32):
        outs.append(
            sorted(
                (r["term"], r["cnt"], r["n_tokens"])
                for r in S.heavy_hitters(
                    df.repartition(parts), "text", k=20
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    # sanity: with 50 uniform words and k=20 some terms do clear n/20
    assert len(outs[0]) > 0
