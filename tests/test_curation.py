"""Curation operators: deterministic splits, winnowing fingerprints,
embedding quantization."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators import curation as C

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  quick\tbrown fox jumps over the lazy dog"),  # same after norm
    (3, "the quick brown fox jumps over the lazy cat"),    # near-dup
    (4, "zzqqkkxx vvbbnnmm ppooiiuu yyttrrww 0011223344 55667788"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_hash_split_deterministic_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id").collect()}
    assert a == b
    # subsetting the corpus must not reassign surviving documents
    sub = df.filter(F.col("doc_id") % 3 == 0)
    c = {r["doc_id"]: r["split"] for r in C.hash_split(sub, "doc_id").collect()}
    assert all(a[k] == v for k, v in c.items())
    # roughly the requested proportions
    from collections import Counter

    n = Counter(a.values())
    assert 0.7 < n["train"] / 2000 < 0.9
    assert 0.05 < n["val"] / 2000 < 0.15
    assert 0.05 < n["test"] / 2000 < 0.15
    # different salt -> different assignment for at least some ids
    d = {r["doc_id"]: r["split"] for r in C.hash_split(df, "doc_id", salt=99).collect()}
    assert any(a[k] != d[k] for k in a)


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantees: any shared substring of length >= k+w-1
    yields at least one shared fingerprint; identical docs share ALL."""
    k, w = 5, 4
    fps = {
        r["id"]: set()
        for r in C.winnow_fingerprints(_docs(spark), k=k, w=w).select("id").collect()
    }
    for r in C.winnow_fingerprints(_docs(spark), k=k, w=w).collect():
        fps[r["id"]].add(r["fp"])
    assert fps[1] == fps[2]  # identical after whitespace normalization
    assert fps[1] & fps[3]   # long shared prefix -> shared fingerprints
    assert not (fps[1] & fps[4])  # disjoint content


def test_winnow_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in C.winnow_pairs(_docs(spark), min_shared=2).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [3.0, 2.0, -3.0, 1.5])],
        "vec_id long, embedding array<double>",
    )
    scale, codes = C.quantize_embedding(F.col("embedding"), bits=8)
    out = df.select("vec_id", scale.alias("s"), codes.alias("q"), "embedding").collect()
    for r in out:
        assert max(abs(q) for q in r["q"]) == 127  # max-abs element saturates
        for v, q in zip(r["embedding"], r["q"]):
            deq = q * r["s"] / 127
            assert abs(deq - v) <= r["s"] / 127 / 2 + 1e-12  # half-step bound


def test_quantize_zero_vector_yields_nulls(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    _, codes = C.quantize_embedding(F.col("embedding"))
    row = df.select(codes.alias("q")).first()
    assert row["q"] == [None, None]


# ---------------------------------------------------------------------------
# per-key caps + temperature source mixing
# ---------------------------------------------------------------------------

def _corpus(spark, per_source):
    rows = []
    i = 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_capped_by_key_matches_single_window(spark):
    from pyspark.sql import Window

    df = _corpus(spark, {"a": 40, "b": 7, "c": 1})
    out = C.capped_by_key(df, "source", "doc_id", cap=5, salt=7, n_subkeys=4)
    got = {(r["source"], r["doc_id"], r["keep_rank"]) for r in out.collect()}

    # oracle: single global window under the same (priority, id) order
    pri = F.floor(C.split_bucket(F.col("doc_id"), 7, 1_000_000)).cast("long")
    w = Window.partitionBy("source").orderBy(pri, "doc_id")
    ref = (
        df.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= 5)
    )
    want = {(r["source"], r["doc_id"], r["keep_rank"]) for r in ref.collect()}
    assert got == want
    per_src = {}
    for src, _, _ in got:
        per_src[src] = per_src.get(src, 0) + 1
    assert per_src == {"a": 5, "b": 5, "c": 1}


def test_capped_by_key_stable_under_corpus_growth(spark):
    base = _corpus(spark, {"a": 30})
    out1 = {r["doc_id"] for r in
            C.capped_by_key(base, "source", "doc_id", cap=30).collect()}
    # adding a DIFFERENT source never reshuffles source a's kept set
    grown = base.unionByName(
        base.sparkSession.createDataFrame([(1000, "b")], ["doc_id", "source"])
    )
    out2 = {r["doc_id"] for r in
            C.capped_by_key(grown, "source", "doc_id", cap=30)
            .filter(F.col("source") == "a").collect()}
    assert out1 == out2


def test_source_mix_rates_and_determinism(spark):
    import math

    df = _corpus(spark, {"big": 64, "mid": 16, "tiny": 4})
    out = C.source_mix(df, "source", "doc_id", base_rate=0.5, salt=11)
    rates = {r["source"]: r["rate_millionths"] for r in
             out.select("source", "rate_millionths").distinct().collect()}
    assert rates["big"] == 500_000                       # 0.5 * sqrt(64/64)
    assert rates["mid"] == math.floor(500_000 * math.sqrt(64 / 16))
    assert rates["tiny"] == 1_000_000                    # capped at 1.0
    # tiny source fully kept; deterministic across re-runs
    kept_tiny = out.filter(F.col("source") == "tiny").count()
    assert kept_tiny == 4
    again = C.source_mix(df, "source", "doc_id", base_rate=0.5, salt=11)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


# ---------------------------------------------------------------------------
# property tests: cap equivalence and mix rate law on randomized corpora
# ---------------------------------------------------------------------------

def test_capped_by_key_property_random_corpora(spark):
    import random

    from pyspark.sql import Window

    rng = random.Random(42)
    for trial in range(5):
        sizes = {f"s{i}": rng.randint(1, 60) for i in range(rng.randint(2, 6))}
        cap = rng.randint(1, 20)
        n_subkeys = rng.choice([2, 4, 16])
        salt = rng.randint(0, 100)
        df = _corpus(spark, sizes)
        got = {
            (r["source"], r["doc_id"], r["keep_rank"])
            for r in C.capped_by_key(
                df, "source", "doc_id", cap=cap, salt=salt, n_subkeys=n_subkeys
            ).collect()
        }
        pri = F.floor(C.split_bucket(F.col("doc_id"), salt, 1_000_000)).cast("long")
        w = Window.partitionBy("source").orderBy(pri, "doc_id")
        want = {
            (r["source"], r["doc_id"], r["keep_rank"])
            for r in df.withColumn("keep_rank", F.row_number().over(w))
            .filter(F.col("keep_rank") <= cap)
            .collect()
        }
        assert got == want, (trial, sizes, cap, n_subkeys, salt)


def test_source_mix_rate_law_and_bounds(spark):
    import math
    import random

    rng = random.Random(7)
    sizes = {f"s{i}": rng.randint(1, 200) for i in range(5)}
    df = _corpus(spark, sizes)
    base = 0.3
    out = C.source_mix(df, "source", "doc_id", base_rate=base, salt=5)
    rates = {r["source"]: r["rate_millionths"] for r in
             out.select("source", "rate_millionths").distinct().collect()}
    cmax = max(sizes.values())
    for src, n in sizes.items():
        expected = math.floor(
            min(1_000_000.0, 1_000_000.0 * base * math.sqrt(cmax / n))
        )
        if src in rates:  # a source can vanish if no doc passes its filter
            assert rates[src] == expected, (src, n)
        kept = out.filter(F.col("source") == src).count()
        assert kept <= n


def test_source_mix_epochs_repetition(spark):
    import math

    df = _corpus(spark, {"big": 64, "tiny": 4})
    out = C.source_mix_epochs(df, "source", "doc_id", base_rate=1.0, salt=11)
    rows = out.collect()
    # big: rate = 1.0 -> exactly one copy of every doc, copy = 0
    big = [r for r in rows if r["source"] == "big"]
    assert len(big) == 64 and all(r["copy"] == 0 for r in big)
    # tiny: rate = sqrt(16) = 4.0 -> exactly 4 copies of each of 4 docs
    tiny = [r for r in rows if r["source"] == "tiny"]
    assert len(tiny) == 16
    per_doc = {}
    for r in tiny:
        per_doc.setdefault(r["doc_id"], set()).add(r["copy"])
    assert all(copies == {0, 1, 2, 3} for copies in per_doc.values())
    # fractional rates keep a deterministic subset of the last copy
    out2 = C.source_mix_epochs(df, "source", "doc_id", base_rate=0.6, salt=11)
    n_big2 = out2.filter(F.col("source") == "big").count()
    assert 0 < n_big2 < 64  # 60% fractional copy of the dominant source
    again = C.source_mix_epochs(df, "source", "doc_id", base_rate=0.6, salt=11)
    assert sorted((r["doc_id"], r["copy"]) for r in out2.collect()) == sorted(
        (r["doc_id"], r["copy"]) for r in again.collect()
    )


def test_seeded_shuffle_domain_guard(spark):
    """Negative / overflow-range ids must raise (the key math assumes a
    non-negative id and int64-safe multiply), not silently produce
    sign-garbled buckets."""
    from modis_aggregation_spark.operators.curation import seeded_shuffle

    bad = spark.createDataFrame([(-3, "d")], "doc_id LONG, text STRING")
    with pytest.raises(Exception, match="out of domain"):
        seeded_shuffle(bad, seed=1).collect()
    huge = spark.createDataFrame(
        [(2**62, "d")], "doc_id LONG, text STRING"
    )
    with pytest.raises(Exception, match="out of domain"):
        seeded_shuffle(huge, seed=1).collect()
    # negative / overflow-range seeds are rejected driver-side: a
    # negative (id + seed) would sign-garble the bucket keys silently
    ok = spark.createDataFrame([(3, "d")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="seed must be"):
        seeded_shuffle(ok, seed=-5)
    with pytest.raises(ValueError, match="seed must be"):
        seeded_shuffle(ok, seed=2**62)


def test_length_batches_distinct_cap(spark):
    """An un-quantized high-cardinality length column fails loudly
    instead of building an unbounded create_map literal."""
    from modis_aggregation_spark.operators.curation import (
        length_bucketed_batches,
    )

    df = spark.createDataFrame(
        [(i, i * 7 % 97) for i in range(60)], "doc_id LONG, n_tokens LONG"
    )
    with pytest.raises(ValueError, match="pre-quantize"):
        length_bucketed_batches(
            df, "n_tokens", max_distinct_lengths=10
        )
    ok = length_bucketed_batches(df, "n_tokens", max_distinct_lengths=1000)
    assert ok.count() == 60


def test_seeded_shuffle_permutation_and_invariance(spark):
    from modis_aggregation_spark.operators.curation import seeded_shuffle

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(500)], "doc_id LONG, text STRING"
    )
    outs = []
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["shuffle_pos"]
            for r in seeded_shuffle(df.repartition(parts), seed=42).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1]  # partition-layout invariant
    assert sorted(outs[0].values()) == list(range(1, 501))  # a permutation
    # global position == rank by (key, id): spot-check against a driver sort
    def key(i):
        k1 = ((i + 42) * 2654435761) % (1 << 32)
        return ((k1 ^ (k1 >> 16)) * 40503) % (1 << 32)

    keys = {i: key(i) for i in range(500)}
    want = {
        i: rank + 1
        for rank, (i, _) in enumerate(sorted(keys.items(), key=lambda kv: (kv[1], kv[0])))
    }
    assert outs[0] == want
    # the two-round mix decorrelates seeds: consecutive-seed orders must
    # NOT be cyclic rotations of each other (the failure mode of the
    # plain affine key)
    def order(seed):
        ks = sorted(range(100), key=lambda i: (
            ((((i + seed) * 2654435761) % (1 << 32))
             ^ ((((i + seed) * 2654435761) % (1 << 32)) >> 16))
            * 40503 % (1 << 32), i))
        return ks
    o0, o1 = order(0), order(1)
    rotations = {tuple(o0[k:] + o0[:k]) for k in range(100)}
    assert tuple(o1) not in rotations
    # a different seed produces a (near-certainly) different order
    other = {
        r["doc_id"]: r["shuffle_pos"]
        for r in seeded_shuffle(df, seed=7).collect()
    }
    assert other != outs[0]


def test_length_bucketed_batches_padding(spark):
    from modis_aggregation_spark.operators.curation import (
        length_bucketed_batches,
    )

    rows = [(i, length) for i, length in enumerate([9, 9, 8, 7, 4, 4, 3, 1])]
    df = spark.createDataFrame(rows, "doc_id LONG, n LONG")
    out = {
        r["doc_id"]: (r["batch_id"], r["batch_max"], r["padding"])
        for r in length_bucketed_batches(df, "n", batch_size=4).collect()
    }
    # sorted desc: [9,9,8,7 | 4,4,3,1] → batch 0 max 9, batch 1 max 4
    assert out[0] == (0, 9, 0) and out[3] == (0, 9, 2)
    assert out[4] == (1, 4, 0) and out[7] == (1, 4, 3)
    total_padding = sum(p for _, _, p in out.values())
    assert total_padding == 0 + 0 + 1 + 2 + 0 + 0 + 1 + 3


def test_token_budget_sample_properties(spark):
    """The draw is the prefix of the shuffle order whose running total
    is under budget; it is partition-invariant, and a larger budget
    keeps a strict superset (extendability — the property that lets a
    pinned corpus grow without resampling)."""
    from modis_aggregation_spark.operators.curation import (
        token_budget_sample,
    )

    rows = [(i, 10 + (i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, n LONG")
    kept = {
        r["doc_id"]: (r["shuffle_pos"], r["tokens_before"])
        for r in token_budget_sample(df, "n", budget=800, seed=3).collect()
    }
    # exact budget semantics against a driver-side replay
    def key(i):
        k1 = ((i + 3) * 2654435761) % (1 << 32)
        return ((k1 ^ (k1 >> 16)) * 40503) % (1 << 32)

    order = sorted(range(300), key=lambda i: (key(i), i))
    lens = dict(rows)
    acc, want = 0, {}
    for pos, i in enumerate(order):
        if acc < 800:
            want[i] = (pos + 1, acc)
        acc += lens[i]
    assert kept == want
    # partition invariance
    kept7 = {
        r["doc_id"]: (r["shuffle_pos"], r["tokens_before"])
        for r in token_budget_sample(
            df.repartition(7), "n", budget=800, seed=3
        ).collect()
    }
    assert kept7 == kept
    # extendability: bigger budget keeps a superset
    bigger = {
        r["doc_id"]
        for r in token_budget_sample(df, "n", budget=2000, seed=3).collect()
    }
    assert set(kept) <= bigger and len(bigger) > len(kept)


def test_corpus_line_dedup_threshold_and_reassembly(spark):
    """Cross-corpus line dedup: frequent lines vanish from every doc,
    unique and short lines survive, and reassembly preserves order."""
    from pyspark.sql import functions as F

    from modis_aggregation_spark.operators.curation import corpus_line_dedup

    docs = spark.createDataFrame(
        [
            (0, "the common banner line\nunique alpha content\nok"),
            (1, "the common banner line\nunique beta content\nok"),
            (2, "unique gamma content\nthe common banner line"),
            (3, "only unique delta here"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in corpus_line_dedup(docs, max_docs=1, min_chars=10).collect()
    }
    # banner appears in 3 distinct docs -> removed everywhere;
    # 'ok' is short -> exempt even though it repeats
    assert out[0] == (3, 1, "unique alpha content\nok")
    assert out[1] == (3, 1, "unique beta content\nok")
    assert out[2] == (2, 1, "unique gamma content")
    assert out[3] == (1, 0, "only unique delta here")
    # empty text = one empty (short, exempt) line, untouched
    assert out[4] == (1, 0, "")
    # max_docs=3 keeps the banner (3 docs is not > 3)
    out3 = {
        r["doc_id"]: r["n_removed"]
        for r in corpus_line_dedup(docs, max_docs=3, min_chars=10).collect()
    }
    assert all(v == 0 for v in out3.values())


def test_leakfree_split_no_pair_straddles(spark):
    """x101 property: every near-dup pair lands in ONE split, and
    unpaired documents get exactly the plain hash_split assignment."""
    from pyspark.sql import functions as F

    from modis_aggregation_spark.operators.curation import (
        hash_split,
        leakfree_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    # chain 0-1-2, pair (10, 11), star 20-{21,22,23}; rest unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (20, 22), (20, 23)],
        ["id_a", "id_b"],
    )
    out = leakfree_split(docs, pairs, salt=7)
    rows = {r["doc_id"]: (r["cluster_key"], r["split"]) for r in out.collect()}
    for a, b in [(0, 1), (1, 2), (0, 2), (10, 11), (20, 21), (21, 22), (22, 23)]:
        assert rows[a][1] == rows[b][1], (a, b)
        assert rows[a][0] == rows[b][0]
    assert rows[0][0] == 0 and rows[10][0] == 10 and rows[23][0] == 20
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", salt=7).collect()
    }
    paired = {0, 1, 2, 10, 11, 20, 21, 22, 23}
    for d in range(40):
        if d not in paired:
            assert rows[d] == (d, plain[d])
