"""operators/tokenizer.py — distributed BPE training: merge-application
semantics (greedy left-to-right, overlap, merged-token-as-left), word
vocab weighting, deterministic tie-breaks, early stop; and encode:
train/encode consistency, empty-doc retention, preview truncation."""

import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.operators.tokenizer import (
    _apply_merge,
    _chars,
    bpe_encode,
    bpe_train,
    word_vocab,
)


def _merge_one(spark, word, left, right):
    df = spark.createDataFrame([(word,)], "word STRING")
    return df.select(
        _apply_merge(_chars(F.col("word")), left, right).alias("s")
    ).collect()[0]["s"]


def test_apply_merge_greedy_semantics(spark):
    # overlap: greedy left-to-right pairs the first two a's only
    assert _merge_one(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _merge_one(spark, "aaaa", "a", "a") == ["aa", "aa"]
    # the merged token must NOT act as `left` within the same pass
    assert _merge_one(spark, "abb", "a", "b") == ["ab", "b"]
    # mid-word merge + no-match passthrough
    assert _merge_one(spark, "aab", "a", "b") == ["a", "ab"]
    assert _merge_one(spark, "xyz", "a", "b") == ["x", "y", "z"]
    # single char: no pairs
    assert _merge_one(spark, "q", "a", "b") == ["q"]


def test_bpe_train_learns_expected_merges(spark):
    # 'the' x3, 'that' x2: pair (t,h) weighted 5 dominates; then
    # (th,e) = 3 beats (a,t)=2 and (th,a)=2 after the first merge
    df = spark.createDataFrame(
        [(1, "the the the that that")], "doc_id LONG, text STRING"
    )
    out = bpe_train(df, "text", num_merges=3, min_pair_count=2).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in out]
    assert got[0] == (1, "t", "h", 5)
    assert got[1] == (2, "th", "e", 3)
    # rank 3: remaining weighted-2 pairs tie; lexicographic (a,t) wins
    assert got[2] == (3, "a", "t", 2)


def test_bpe_train_early_stop_and_vocab(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id LONG, text STRING"
    )
    vocab = {r["word"]: r["count"] for r in word_vocab(df).collect()}
    assert vocab == {"ab": 2, "cd": 1}
    out = bpe_train(df, "text", num_merges=5, min_pair_count=2).collect()
    # only (a,b)=2 reaches min_pair_count; training stops after 1 merge
    assert len(out) == 1
    assert (out[0]["left"], out[0]["right"], out[0]["pair_count"]) == ("a", "b", 2)


def test_bpe_encode_matches_training_vocab(spark):
    # encode with the learned merges must reproduce training's final
    # symbol state: corpus-wide counts are the:4 that:3, so the learned
    # merges are (t,h):7, (th,e):4, then the weighted-3 tie (a,t) vs
    # (th,a) breaks lexicographic to (a,t) — 'the'->[the],
    # 'that'->[th,at]; word order / counts / preview must be exact
    df = spark.createDataFrame(
        [(1, "the the the that that"), (2, "THE\tthat"), (3, "   ")],
        "doc_id LONG, text STRING",
    )
    merges = bpe_train(df, "text", num_merges=3, min_pair_count=2)
    out = {
        r["doc_id"]: r
        for r in bpe_encode(df, merges, "text", "doc_id", preview_k=4).collect()
    }
    assert len(out) == 3
    assert (out[1]["n_words"], out[1]["n_tokens"]) == (5, 3 * 1 + 2 * 2)
    # preview truncates at k=4 tokens
    assert out[1]["tokens_preview"] == "the the the th"
    # lowercasing + tab split
    assert (out[2]["n_words"], out[2]["n_tokens"]) == (2, 1 + 2)
    assert out[2]["tokens_preview"] == "the th at"
    # token-less doc is RETAINED with zeros and an empty preview
    assert (out[3]["n_words"], out[3]["n_tokens"], out[3]["tokens_preview"]) == (
        0, 0, ""
    )


def test_bpe_encode_accepts_plain_merge_list(spark):
    df = spark.createDataFrame([(7, "abab ab")], "doc_id LONG, text STRING")
    out = bpe_encode(df, [("a", "b"), ("ab", "ab")], "text", "doc_id").collect()
    assert (out[0]["n_words"], out[0]["n_tokens"]) == (2, 2)
    assert out[0]["tokens_preview"] == "abab ab"
