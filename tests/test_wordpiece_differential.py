"""Property-based differential harness for distributed WordPiece:
random corpora vs the independent dict-based trainer/matcher that backs
the x90/x91 goldens — guards the likelihood-score argmax (one IEEE
division + lexicographic tie-break), the ##-prefix merge fold, and the
greedy longest-match encoder over inputs the committed goldens never
see: repeated characters, single-char words, merged-token chaining."""

from __future__ import annotations

import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from modis_aggregation_spark.operators.tokenizer import (  # noqa: E402
    wordpiece_encode,
    wordpiece_train,
)
from tools.make_goldens import (  # noqa: E402
    _independent_wordpiece,
    _wordpiece_match,
)

# tiny alphabet maximizes pair collisions and score ties
_WORD = st.text(alphabet="abc", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(corpus=_CORPUS)
def test_wordpiece_train_and_encode_match_reference(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id LONG, text STRING"
    )
    model = wordpiece_train(df, "text", num_merges=4, min_pair_count=2)
    got_merges = [
        (r["rank"], r["left"], r["right"], r["merged"],
         r["pair_count"], r["left_count"], r["right_count"])
        for r in model.orderBy("rank").collect()
    ]
    want_merges, wvocab = _independent_wordpiece(
        corpus, num_merges=4, min_pair_count=2
    )
    assert got_merges == [tuple(m) for m in want_merges]

    vocab = {m[3] for m in want_merges}
    for w in wvocab:
        vocab.add(w[0])
        vocab.update("##" + c for c in w[1:])
    got = {
        r["doc_id"]: r
        for r in wordpiece_encode(
            df, model, "text", "doc_id", preview_k=5
        ).collect()
    }
    assert set(got) == set(range(len(corpus)))
    for i, text in enumerate(corpus):
        words = [w for w in text.lower().split() if w]
        pieces = [] if not words else [
            t for w in words for t in _wordpiece_match(w, vocab)
        ]
        assert got[i]["n_words"] == len(words), (i, text)
        assert got[i]["n_pieces"] == len(pieces), (i, text)
        assert got[i]["n_unk"] == sum(
            1 for t in pieces if t == "[UNK]"
        ), (i, text)
        assert got[i]["pieces_preview"] == " ".join(pieces[:5]), (i, text)
