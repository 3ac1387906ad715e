"""Distributed unigram-LM tokenizer training
(operators/tokenizer.unigram_train): partition-layout invariance (the
integer-micro M-step), agreement with an independent dict-based EM on
random corpora, and model-shape/seed-rule semantics."""

from __future__ import annotations

import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modis_aggregation_spark.operators.tokenizer import unigram_train

sys.path.insert(0, "/root/repo/tools")
from make_goldens import _independent_unigram  # noqa: E402

_WORD = st.text(alphabet="abcd", min_size=1, max_size=7)
_DOC = st.lists(_WORD, min_size=0, max_size=10).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _collect(df):
    return [
        (r["rank"], r["piece"], r["count_micro"], r["prob"])
        for r in df.orderBy("rank").collect()
    ]


def test_matches_independent_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a mat a cat a hat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = _collect(
        unigram_train(df, seed_multi=20, vocab_size=16, num_iters=2)
    )
    want = _independent_unigram(
        texts, seed_multi=20, vocab_size=16, num_iters=2
    )
    assert got == want
    # model sanity: ranked by count desc, prob mass <= 1, useful
    # multi-char pieces learned
    counts = [c for _, _, c, _ in got]
    assert counts == sorted(counts, reverse=True)
    assert sum(p for _, _, _, p in got) <= 1.000001
    assert any(len(piece) > 1 for _, piece, _, _ in got)


def test_partition_layout_invariance(spark):
    texts = [f"alpha beta{i % 3} gamma alpha" for i in range(40)]
    outs = []
    for parts in (1, 5, 16):
        df = spark.createDataFrame(
            [(t,) for t in texts], "text STRING"
        ).repartition(parts)
        outs.append(
            _collect(unigram_train(df, seed_multi=16, vocab_size=12))
        )
    assert outs[0] == outs[1] == outs[2]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_differential_random_corpora(spark, corpus):
    if not any(t.strip() for t in corpus):
        return  # empty vocab: nothing to train on
    df = spark.createDataFrame([(t,) for t in corpus], "text STRING")
    got = _collect(
        unigram_train(df, seed_multi=10, vocab_size=8, num_iters=2)
    )
    want = _independent_unigram(
        corpus, seed_multi=10, vocab_size=8, num_iters=2
    )
    assert got == want


def test_seed_rule_and_validation(spark):
    df = spark.createDataFrame([("ab ab ab",)], "text STRING")
    out = _collect(unigram_train(df, seed_multi=2, vocab_size=10))
    pieces = {p for _, p, _, _ in out}
    # singles always seeded; 'ab' is the only multi-char candidate kept
    assert {"a", "b"} <= pieces
    assert "ab" in pieces
    with pytest.raises(ValueError, match="num_iters"):
        unigram_train(df, num_iters=0)


def test_unigram_encode_matches_independent_viterbi(spark):
    from make_goldens import _TOKEN_WS, _viterbi_segment
    from modis_aggregation_spark.operators.tokenizer import unigram_encode

    texts = [
        (0, "the cat sat on the mat"),
        (1, "a mat a cat a hat"),
        (2, ""),            # token-less doc must survive with 0 pieces
        (3, "zzz qqq"),     # words full of vocab-dropped chars (OOV path)
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    model = unigram_train(df, seed_multi=12, vocab_size=10, num_iters=2)
    counts = {r["piece"]: r["count_micro"] for r in model.collect()}
    got = {
        r["doc_id"]: r for r in unigram_encode(df, model).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[2]["n_words"] == 0 and got[2]["n_pieces"] == 0
    assert got[2]["pieces_preview"] == ""
    for doc_id, text in texts:
        words = [w for w in _TOKEN_WS.split(text.lower()) if w]
        pieces = [p for w in words for p in _viterbi_segment(w, counts)]
        assert got[doc_id]["n_words"] == len(words)
        assert got[doc_id]["n_pieces"] == len(pieces)
        assert got[doc_id]["pieces_preview"] == " ".join(pieces[:10])
    # OOV single chars segment as themselves
    assert got[3]["pieces_preview"].split()[0:3] == ["z", "z", "z"]


def test_unigram_encode_prefers_likely_pieces(spark):
    from modis_aggregation_spark.operators.tokenizer import unigram_encode

    df = spark.createDataFrame(
        [(0, "hello hello hello world")], "doc_id LONG, text STRING"
    )
    model = unigram_train(df, seed_multi=20, vocab_size=16, num_iters=2)
    out = unigram_encode(df, model).collect()[0]
    # frequent whole-word substrings compress far below char count
    assert out["n_pieces"] < 4 * 5
    with pytest.raises(ValueError, match="empty model"):
        unigram_encode(df, {}).collect()
