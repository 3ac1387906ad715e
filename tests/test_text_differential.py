"""Property-based differential tests: the C4/Gopher screen expressions vs
pure-Python reference implementations of the same rule SPECS.

Texts are drawn from an ASCII-plus-bullet alphabet (Java regex and RE2
treat ``\\s``/casing ASCII-only; exotic-unicode casing differences are
engine semantics, not screen logic, and are deliberately out of scope).
The Python references mimic Java semantics: trim strips SPACES only,
``\\S`` is the ASCII complement class.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.text import (
    GOPHER_STOPWORDS,
    c4_clean,
    gopher_quality,
)

_WS = " \t\x0b\f\r"  # Java \s minus \n (newline splits lines first)
_WORD_RE = re.compile(r"[^ \t\n\x0b\f\r]+")

_VOCAB = [
    "the", "be", "to", "of", "and", "words", "data", "spark", "a",
    "javascript", "Javascript", "#", "##", "...", "-", "*", "•", "{",
    "lorem", "ipsum", "lorem ipsum", "end.", "stop!", "why?", 'quote"',
    "", " ", "  ",
]


def _texts():
    line = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(
        " ".join
    )
    return st.lists(line, min_size=0, max_size=6).map("\n".join)


def _ref_c4(text: str, min_words: int = 5, min_sentences: int = 3):
    lines = text.split("\n")
    kept = []
    for ln in lines:
        t = ln.strip(" ")
        ok = (
            bool(re.search(r'[.!?"]$', t))
            and len(_WORD_RE.findall(t)) >= min_words
            and "javascript" not in t.lower()
        )
        if ok:
            kept.append(ln)
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    kept_doc = (
        n_sent >= min_sentences
        and "{" not in text
        and "lorem ipsum" not in text.lower()
    )
    return len(lines), len(kept), clean, kept_doc


def _ref_gopher(text: str):
    words = _WORD_RE.findall(text.lower())
    lines = text.split("\n")
    wc = len(words)
    n = wc or None
    nl = len(lines) or None
    mwl = len(re.sub(r"[ \t\n\x0b\f\r]", "", text)) / n if n else None
    n_hash = len(text) - len(text.replace("#", ""))
    n_ell = (len(text) - len(text.replace("...", ""))) / 3
    sym = (n_hash + n_ell) / n if n else None
    bullet = (
        sum(1 for x in lines if re.match(r"^[-*•]", x.strip(" "))) / nl
        if nl
        else None
    )
    ell = (
        sum(1 for x in lines if re.search(r"\.\.\.$", x.strip(" "))) / nl
        if nl
        else None
    )
    alpha = (
        sum(1 for w in words if re.search("[A-Za-z]", w)) / n if n else None
    )
    stops = sum(1 for s in GOPHER_STOPWORDS if s in words)
    return wc, mwl, sym, bullet, ell, alpha, stops


def _approx(a, b):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) < 1e-9


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batch=st.lists(_texts(), min_size=1, max_size=20))
def test_c4_clean_matches_python_reference(spark, batch):
    df = spark.createDataFrame(list(enumerate(batch)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    for i, text in enumerate(batch):
        n_lines, n_kept, clean, kept_doc = _ref_c4(text)
        r = got[i]
        assert r["n_lines"] == n_lines, (i, text)
        assert r["n_lines_kept"] == n_kept, (i, text)
        assert r["clean_text"] == clean, (i, text)
        assert bool(r["kept"]) == kept_doc, (i, text)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batch=st.lists(_texts(), min_size=1, max_size=20))
def test_gopher_quality_matches_python_reference(spark, batch):
    df = spark.createDataFrame(list(enumerate(batch)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    for i, text in enumerate(batch):
        wc, mwl, sym, bullet, ell, alpha, stops = _ref_gopher(text)
        r = got[i]
        assert r["word_count"] == wc, (i, text)
        assert _approx(r["mean_word_len"], mwl), (i, text)
        assert _approx(r["symbol_ratio"], sym), (i, text)
        assert _approx(r["bullet_frac"], bullet), (i, text)
        assert _approx(r["ellipsis_frac"], ell), (i, text)
        assert _approx(r["alpha_frac"], alpha), (i, text)
        assert r["n_stopword_hits"] == stops, (i, text)
