"""Text-analysis column builders for the large-scale pipeline extension.

All hot-path expressions are built-in Catalyst functions (split, transform,
aggregate, xxhash64 …) — no Python UDFs. These operate on the `documents`
table shape (doc_id, text, lang, source, n_chars) but take plain Columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, embedded — no model downloads at 100 TB scale;
# extend per deployment.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "pour", "que", "dans"),
    "it": ("il", "la", "di", "che", "e", "un", "per", "con", "non", "una"),
}

# Whitespace + BPE-ish word/number/punctuation splitter for token counting.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

# GPT-2-flavored subword pre-tokenizer: contraction suffixes, then
# space-prefixed letter/digit/punctuation runs, then whitespace runs.
# ASCII classes (not \p{L}) so Java regex (Spark) and RE2 (DuckDB oracle)
# agree exactly; GPT-2's trailing `\s+(?!\S)` lookahead is dropped (RE2
# has no lookahead) — the plain `\s+` fallback differs only on interior
# multi-space runs, which collapse to one token here.
SUBWORD_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty strings removed).

    The split class is spelled out as ``[ \\t\\n\\f\\r]+`` rather than
    ``\\s+`` because Java's ``\\s`` includes vertical tab (\\x0b) while
    RE2's (the DuckDB oracle side, ``string_split_regex(..., '\\s+')``)
    does not — a document containing \\x0b would tokenize differently on
    the two engines and hash-mismatch every token-derived contract
    query. Both engines agree exactly on this explicit class.
    """
    return F.filter(
        F.split(F.lower(text), r"[ \t\n\f\r]+"), lambda t: t != ""
    )


def token_count(text: Column) -> Column:
    """BPE-ish token count: words + numbers + individual punctuation
    (regexp-based; a cheap proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def subword_token_count(text: Column) -> Column:
    """GPT-2-style subword-count estimate (pre-tokenizer matches only —
    no merges table, so this upper-bounds a real BPE count). Pure regexp
    expression; the cheap context-window sizing signal for chunking and
    per-document token budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit(SUBWORD_REGEX), 0))


def word_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-whitespace characters that are punctuation."""
    no_ws = F.regexp_replace(text, r"\s+", "")
    punct = F.regexp_replace(no_ws, r"[A-Za-z0-9]", "")
    return F.length(punct) / F.nullif(F.length(no_ws), F.lit(0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits / F.nullif(F.size(toks), F.lit(0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.nullif(F.size(toks), F.lit(0))


def quality_score(text: Column, lang: str = "en") -> Column:
    """Heuristic [0,1] document-quality score: long-enough, low punctuation,
    some stopwords, sane mean word length — the standard cheap pre-filters
    of large-scale corpus curation."""
    wc = word_count(text)
    len_score = F.least(wc / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    sw = stopword_ratio(text, lang)
    sw_score = F.least(sw * 5, F.lit(1.0))
    mwl = mean_word_length(text)
    mwl_score = F.when((mwl >= 2.5) & (mwl <= 10.0), 1.0).otherwise(0.3)
    return (len_score * 0.3 + punct_pen * 0.3 + sw_score * 0.2 + mwl_score * 0.2).alias(
        "quality"
    )


def lang_id(text: Column) -> Column:
    """Stopword-overlap language ID over the embedded lists.

    Scores each language by stopword-hit fraction; argmax via array_max on
    (score, lang) structs — entirely JVM-side. Returns 'und' when nothing
    matches.
    """
    toks = tokens(text)
    n = F.nullif(F.size(toks), F.lit(0))

    # NB: higher-order-function lambdas must have exactly one parameter —
    # pyspark treats a second parameter (even a default-valued closure
    # capture) as the array-index argument. Bind via factory instead.
    def _isin(sw: tuple[str, ...]):
        return lambda t: t.isin(*sw)

    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, _isin(sw))) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def text_profile(df, content_col: str = "text", lang: str = "en"):
    """All text statistics in one staged pass: tokens and the
    whitespace-stripped form are MATERIALIZED columns, so each statistic
    reads an attribute instead of re-tokenizing (Catalyst does not CSE
    expressions into per-statistic lambdas — inline tokens() would re-run
    split per statistic, and per language for lang_id).

    Returns df plus: word_count, token_count, punct_ratio, stopword_ratio,
    mean_word_len, quality, lang.
    """
    staged = df.withColumns(
        {
            "__toks": tokens(F.col(content_col)),
            "__no_ws": F.regexp_replace(F.col(content_col), r"\s+", ""),
        }
    )
    toks = F.col("__toks")
    no_ws = F.col("__no_ws")
    n = F.nullif(F.size(toks), F.lit(0))
    punct = F.regexp_replace(no_ws, r"[A-Za-z0-9]", "")
    # second staging layer (round 12): the three ratios feed both their
    # output column AND the quality formula — left inline, the executed
    # plan re-ran the mean-word-length fold 3x, the stopword filter 2x
    # and the punctuation regexp 2x per row (Catalyst CSEs only cheap
    # size/length subtrees).  Multi-referenced non-cheap projections
    # survive CollapseProject (same mechanism that keeps __toks staged)
    # — verified on the executed plan: each runs exactly once.
    staged = staged.withColumns(
        {
            "__pr": F.length(punct) / F.nullif(F.length(no_ws), F.lit(0)),
            "__sw": F.size(
                F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
            ) / n,
            "__mwl": F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ) / n,
        }
    )
    pr = F.col("__pr")
    sw = F.col("__sw")
    mwl = F.col("__mwl")
    wc = F.size(toks)
    len_score = F.least(wc / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - pr * 4)
    sw_score = F.least(sw * 5, F.lit(1.0))
    mwl_score = F.when((mwl >= 2.5) & (mwl <= 10.0), 1.0).otherwise(0.3)

    def _isin(words: tuple[str, ...]):
        return lambda t: t.isin(*words)

    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, _isin(words))) / n).alias("score"),
                F.lit(lg).alias("lang"),
            )
            for lg, words in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(scored)
    return staged.withColumns(
        {
            "word_count": wc,
            "token_count": F.size(
                F.regexp_extract_all(F.col(content_col), F.lit(TOKEN_REGEX), 0)
            ),
            "punct_ratio": pr,
            "stopword_ratio": sw,
            "mean_word_len": mwl,
            "quality": len_score * 0.3 + punct_pen * 0.3 + sw_score * 0.2 + mwl_score * 0.2,
            "lang": F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
        }
    ).drop("__toks", "__no_ws", "__pr", "__sw", "__mwl")


# PII patterns — ASCII classes, no lookarounds, so Java regex (Spark) and
# RE2 (DuckDB oracle) match identically. Redaction ORDER matters (emails
# and IPs contain digit runs a phone pattern would eat): email → ip →
# phone, each count taken on the PREVIOUS stage's redacted text so the
# counts are unambiguous under overlap.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE = r"\+?[(]?[0-9][0-9\-\s().]{5,}[0-9]"

_PII_STAGES: tuple[tuple[str, str, str], ...] = (
    ("emails", PII_EMAIL, "<EMAIL>"),
    ("ips", PII_IP, "<IP>"),
    ("phones", PII_PHONE, "<PHONE>"),
)


def pii_scrub(df, content_col: str = "text"):
    """Count and redact emails, IPv4s, and phone numbers.

    Adds n_emails / n_ips / n_phones and ``redacted``. Each intermediate
    redaction stage is a MATERIALIZED column (withColumns chain) so every
    regex runs once per row — pure Catalyst regexp expressions, no UDFs;
    at corpus scale this is a map-only stage fused onto the scan.
    """
    staged = df.withColumn("__t0", F.col(content_col))
    prev = "__t0"
    counts: dict[str, str] = {}
    for i, (name, pat, repl) in enumerate(_PII_STAGES, start=1):
        cur = f"__t{i}"
        staged = staged.withColumns(
            {
                f"n_{name}": F.size(
                    F.regexp_extract_all(F.col(prev), F.lit(pat), 0)
                ),
                cur: F.regexp_replace(F.col(prev), pat, repl),
            }
        )
        counts[name] = cur
        prev = cur
    return staged.withColumn("redacted", F.col(prev)).drop(
        *[f"__t{i}" for i in range(len(_PII_STAGES) + 1)]
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (public heuristics from Raffel et al. 2020,
# "Exploring the Limits of Transfer Learning", §2.2) and Gopher document
# quality rules (Rae et al. 2021, "Scaling Language Models", table A1).
# All pure Catalyst expressions — ASCII regex classes only, so the Java
# regex engine (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
# ---------------------------------------------------------------------------

C4_TERMINAL_RE = r'[.!?"]$'


def c4_clean(
    df,
    content_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
):
    """C4-style line-level cleanup: keep only lines that end in terminal
    punctuation, have >= ``min_words_per_line`` words, and don't mention
    'javascript'; a document survives iff its cleaned text still has
    >= ``min_sentences`` sentence terminators and the raw text has no
    '{' (code marker) and no 'lorem ipsum' (placeholder marker).

    Adds: n_lines, n_lines_kept, clean_text, kept. The line array is a
    MATERIALIZED column (one split per row); per-line predicates run
    inside a single-parameter ``F.filter`` lambda — a map-only stage that
    fuses onto the scan at corpus scale (no shuffle, no UDF).
    """
    staged = df.withColumn("__lines", F.split(F.col(content_col), "\n"))
    lines = F.col("__lines")

    def _keep(x):
        t = F.trim(x)
        return (
            t.rlike(C4_TERMINAL_RE)
            & (
                F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
                >= F.lit(min_words_per_line)
            )
            & ~F.contains(F.lower(t), F.lit("javascript"))
        )

    # the filtered line array is a MATERIALIZED column (round 12): it
    # feeds n_lines_kept, clean_text and (via the sentence count) kept —
    # left inline, the executed plan re-ran the per-line RLIKE battery
    # THREE times per row.  clean_text is likewise staged before the
    # sentence count reads it.  Multi-referenced non-cheap projections
    # survive CollapseProject; verified on the executed plan.
    staged = staged.withColumn("__c4_kept", F.filter(lines, _keep))
    kept = F.col("__c4_kept")
    raw = F.col(content_col)
    staged = staged.withColumns(
        {
            "n_lines": F.size(lines),
            "n_lines_kept": F.size(kept),
            "clean_text": F.array_join(kept, "\n"),
        }
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("clean_text"), F.lit(r"[.!?]"), 0)
    )
    return staged.withColumn(
        "kept",
        (n_sent >= F.lit(min_sentences))
        & ~F.contains(raw, F.lit("{"))
        & ~F.contains(F.lower(raw), F.lit("lorem ipsum")),
    ).drop("__lines", "__c4_kept")


GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality(
    df,
    content_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
):
    """Full Gopher document-quality rule battery in ONE projection pass.

    Adds the raw metrics (word_count, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_frac, n_stopword_hits) plus the
    conjunct ``gopher_pass``. Words/lines arrays are MATERIALIZED once;
    every rule is a Catalyst expression over them — no UDFs, no shuffle;
    mean word length uses the whitespace-stripped character count (equal
    to the sum of \\S+ token lengths) to avoid a per-row aggregate lambda.
    """
    staged = df.withColumns(
        {
            "__gw": F.regexp_extract_all(
                F.lower(F.col(content_col)), F.lit(r"\S+"), 0
            ),
            "__gl": F.split(F.col(content_col), "\n"),
        }
    )
    raw = F.col(content_col)
    words, lines = F.col("__gw"), F.col("__gl")
    wc = F.size(words)
    n = F.nullif(wc, F.lit(0))
    nl = F.nullif(F.size(lines), F.lit(0))
    mwl = F.length(F.regexp_replace(raw, r"\s", "")) / n
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis) / n
    bullet_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))) / nl
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"\.\.\.$"))) / nl
    )
    alpha_frac = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))) / n
    stop_hits = None
    for s in GOPHER_STOPWORDS:
        hit = F.array_contains(words, s).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    # metrics are MATERIALIZED columns and the pass conjunct reads the
    # ATTRIBUTES (round 12): inline, every regex/filter metric was
    # evaluated twice per row — once for its output column and once
    # inside gopher_pass.  Multi-referenced non-cheap projections
    # survive CollapseProject; verified on the executed plan.
    staged = staged.withColumns(
        {
            "word_count": wc,
            "mean_word_len": mwl,
            "symbol_ratio": symbol_ratio,
            "bullet_frac": bullet_frac,
            "ellipsis_frac": ellipsis_frac,
            "alpha_frac": alpha_frac,
            "n_stopword_hits": stop_hits,
        }
    )
    return staged.withColumn(
        "gopher_pass",
        F.col("word_count").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stopword_hits") >= min_stopwords),
    ).drop("__gw", "__gl")


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct lowercase character k-grams (the MinHash input)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercase text
    (rolling-hash equivalent for exact near-identity grouping)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)
