"""Corpus-curation operators: deterministic splits, winnowing fingerprints,
embedding quantization.

All three are pure Catalyst expression pipelines (no UDFs, no shuffles
beyond the caller's aggregations) built on exact 64-bit integer arithmetic
so an external SQL engine can reproduce them value-for-value — unlike the
xxhash64-based sketches (MinHash/SimHash), these are fully oracle-checkable.

Scale notes: every operator here is a narrow projection (row → rows);
cost is O(bytes scanned) with no data movement. The winnowing fingerprint
table (a few × 8 B per document) is the join-key side of any downstream
near-dup pair join, same shape as the MinHash band keys.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative constant (2^32 / golden ratio), exact in int64
_MULT = 2654435761
_MOD = 4294967296  # 2^32


def split_bucket(id_col: Column, salt: int = 0, n_buckets: int = 1000) -> Column:
    """Deterministic bucket 0..n_buckets-1 from an integer id.

    ``(((id + salt) * K) mod 2^32) * n / 2^32`` — multiplicative hashing
    taking the TOP bits (low bits of ``id*K`` are biased for sequential
    ids). The salt shifts the id BEFORE the multiply so different salts
    produce uncorrelated assignments (an additive post-multiply salt only
    nudges within a bucket). Exact int64 arithmetic: reproducible in any
    engine, stable forever — the property a train/test split must have so
    later pipeline runs never migrate a document across splits. Requires
    ``(id + salt) * K < 2^63`` (ids below ~3.4e9).
    """
    b = ((id_col.cast("long") + F.lit(salt)) * F.lit(_MULT)) % F.lit(_MOD)
    return (b * F.lit(n_buckets)) / F.lit(_MOD)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Assign every row a stable ``split`` label (train/val/test …).

    ``weights`` maps label → fraction (must sum to ≤ 1; remainder goes to
    the last label). Assignment depends only on (id, salt) — adding or
    removing other rows never reassigns a document, which is what keeps
    eval sets uncontaminated across pipeline re-runs at corpus scale.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = F.floor(split_bucket(F.col(id_col), salt)).cast("long")
    edges: list[tuple[str, int]] = []
    acc = 0.0
    for label, frac in weights.items():
        acc += frac
        edges.append((label, round(acc * 1000)))
    expr = None
    for label, hi in edges:  # when-chain, lowest threshold first
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = expr.otherwise(edges[-1][0])
    return df.withColumn("bucket", bucket).withColumn("split", expr)


# --------------------------------------------------------------------------
# winnowing (MOSS-style) document fingerprints
# --------------------------------------------------------------------------

_B = 257  # polynomial base over extended-ASCII codes


def _gram_hash(norm: Column, i, k: int) -> Column:
    """Exact polynomial hash of the char k-gram at 1-based position ``i``:
    Σ ascii(c_j)·257^(k-1-j). No modulus — for k ≤ 7 the value fits int64
    exactly, so ANY engine computing the same sum matches bit-for-bit
    (the reason this fingerprint family is oracle-checkable while
    xxhash-based MinHash is not)."""
    # ascii() is cast to LONG before the multiply: small powers of 257 are
    # IntegerType literals, and an int32 product overflows (ANSI error /
    # silent wrap) for codepoints >= 127 — the sum itself is unchanged for
    # the ASCII range the recorded oracles cover. Astral-plane codepoints
    # (> 0xFFFF) can still exceed int64 at high coefficients; hash_embed
    # uses the clamped variant for full-Unicode inputs.
    terms = [
        F.ascii(norm.substr(i + j, F.lit(1))).cast("long")
        * F.lit(_B ** (k - 1 - j))
        for j in range(k)
    ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every char
    k-gram of the normalized text, slide a window of ``w`` hashes, keep the
    window minimum, dedupe. Guarantees any shared substring of length
    ≥ k+w-1 contributes at least one shared fingerprint — the standard
    local document-fingerprinting scheme (MOSS).

    Returns distinct ``(id, fp)`` rows.

    Implementation (round 8): normalization stays a JVM expression (Java
    regex/lowercase semantics — the recorded contract), then the hashes
    and window minima run as a numpy sliding-window pass inside one Arrow
    ``mapInPandas`` — the CHAR-granular case where vectorized Python
    beats Catalyst HOFs outright: the expression form re-walked an
    interpreted per-element tree (k substr+multiply per position, then a
    w-slice min per window) and measured 14.7 s at sf0.1 vs ~1 s
    vectorized, identical values (the polynomial is exact int64 — see
    ``_gram_hash``).  The expression construction survives as
    ``_winnow_fps_hof``, kept as a differential-test twin
    (tests/test_extensions.py) so the two can never drift.
    Map-only: no shuffle; the Arrow batch carries only (id, __norm).
    """
    import pandas as pd

    norm = F.regexp_replace(F.lower(F.col(content_col)), r"\s+", " ")
    staged = df.select(F.col(id_col).alias("id"), norm.alias("__norm"))
    weights = np.array([_B ** (k - 1 - j) for j in range(k)], dtype=np.int64)

    def batches(it):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in it:
            out_ids, out_fps = [], []
            for id_, s in zip(pdf["id"], pdf["__norm"]):
                if s is None:
                    continue  # null text -> no rows (matches the HOF form)
                cp = (
                    np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
                    .astype(np.int64)
                    if s
                    else np.zeros(0, np.int64)
                )
                n = len(cp)
                ng = max(n - (k - 1), 1)
                # chars past the end contribute 0 (ascii('') = 0), so a
                # short document yields one partial-gram hash — frozen by
                # the recorded x17 values
                padded = np.zeros(ng + k - 1, dtype=np.int64)
                padded[: min(n, ng + k - 1)] = cp[: ng + k - 1]
                h = sliding_window_view(padded, k) @ weights
                if len(h) >= w:
                    mins = sliding_window_view(h, w).min(axis=1)
                else:
                    mins = h.min(keepdims=True)
                fps = np.unique(mins)
                out_ids.extend([id_] * len(fps))
                out_fps.extend(fps.tolist())
            yield pd.DataFrame(
                {
                    "id": pd.array(out_ids, dtype="int64"),
                    "fp": pd.array(out_fps, dtype="int64"),
                }
            )

    return staged.mapInPandas(batches, "id BIGINT, fp BIGINT")


def _winnow_fps_hof(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Pure-Catalyst construction of ``winnow_fingerprints`` — the
    differential-test twin (identical values by construction; an
    interpreted per-element tree, ~14x slower — kept for verification,
    not production use)."""
    norm = F.regexp_replace(F.lower(F.col(content_col)), r"\s+", " ")
    staged = df.select(F.col(id_col).alias("id"), norm.alias("__norm"))
    n_grams = F.greatest(F.length("__norm") - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: _gram_hash(F.col("__norm"), i, k),
    )
    staged = staged.select("id", hashes.alias("__h"))
    n_windows = F.greatest(F.size("__h") - (w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(F.col("__h"), i, w)),
        )
    )
    return staged.select(
        "id", F.explode_outer(fps).alias("fp")
    ).filter(F.col("fp").isNotNull())


def winnow_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints.

    Inverted-index self-join on ``fp`` (skinny 16 B rows), counting shared
    fingerprints per pair. ``max_fp_freq`` drops boilerplate fingerprints
    shared by too many documents via a broadcast anti-join — the same
    bounded-fan-out cap as the MinHash bucket cap.
    """
    fps = winnow_fingerprints(df, content_col, id_col, k, w)
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > max_fp_freq)
        .select("fp")
    )
    fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    lhs, rhs = fps.alias("l"), fps.alias("r")
    return (
        lhs.join(
            rhs,
            on=[F.col("l.fp") == F.col("r.fp"), F.col("l.id") < F.col("r.id")],
        )
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls below the stratum's fraction. Unlike ``df.sampleBy`` (Bernoulli
    on a per-run RNG) the kept set depends only on (id, salt) — re-runs,
    retries, and incremental batches sample the SAME rows, so downstream
    artifacts are reproducible. Pure narrow projection, no shuffle; the
    fraction table is a Catalyst map literal, never a join.

    ``fractions`` maps stratum value → keep fraction in [0, 1]; strata not
    listed keep ``default_frac``.
    """
    n = 1_000_000
    bucket = F.floor(split_bucket(F.col(id_col), salt, n_buckets=n)).cast("long")
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.extend([F.lit(k), F.lit(int(round(v * n)))])
    thresh = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)],
        F.lit(int(round(default_frac * n))),
    )
    return df.where(bucket < thresh)


def capped_by_key(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    salt: int = 7,
    n_subkeys: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` rows per key (per-domain caps in web-corpus
    curation), chosen by a STABLE hash priority so re-runs keep the same
    rows. Adds ``keep_rank`` (1..cap within the key).

    Two-phase selection so one mega-domain never lands on one reducer:
    phase 1 ranks within (key, subkey) — ``n_subkeys`` deterministic hash
    subgroups — and keeps ≤ cap per subgroup, bounding any window
    partition at ~|key| / n_subkeys rows; phase 2 re-ranks the ≤
    cap·n_subkeys survivors per key. The union of per-subgroup top-cap
    sets is a superset of the global top-cap under the same total order
    (priority, id), so the result is IDENTICAL to a single global window
    — that single-window form is the oracle.
    """
    staged = df.withColumns(
        {
            "__pri": F.floor(
                split_bucket(F.col(id_col), salt, 1_000_000)
            ).cast("long"),
            "__sub": F.floor(
                split_bucket(F.col(id_col), salt + 1, n_subkeys)
            ).cast("long"),
        }
    )
    w1 = Window.partitionBy(key_col, "__sub").orderBy("__pri", id_col)
    p1 = (
        staged.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= cap)
    )
    w2 = Window.partitionBy(key_col).orderBy("__pri", id_col)
    return (
        p1.withColumn("keep_rank", F.row_number().over(w2))
        .filter(F.col("keep_rank") <= cap)
        .drop("__pri", "__sub", "__rn1")
    )


def source_mix(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    base_rate: float = 0.5,
    salt: int = 11,
) -> DataFrame:
    """Temperature-style source rebalancing (alpha = 0.5): every source's
    keep rate is ``min(1, base_rate * sqrt(c_max / c_s))`` — rare sources
    are kept at up to 1.0, the dominant source at ``base_rate`` — applied
    as a deterministic hash-bucket filter, so the kept set is stable
    across re-runs and incremental batches.

    alpha is fixed at 0.5 because sqrt is IEEE correctly-rounded: the
    rate arithmetic reproduces bit-for-bit in any engine (the oracle
    property); a pow(x, alpha) would not. Shape: one tiny per-source
    count aggregate, broadcast back; the filter itself is narrow.

    Adds ``rate_millionths`` (the integer keep threshold per source).
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("__cnt"))
    cmax = counts.agg(F.max("__cnt").alias("__cmax"))
    rate = F.floor(
        F.least(
            F.lit(1_000_000.0),
            F.lit(1_000_000.0 * base_rate)
            * F.sqrt(F.col("__cmax").cast("double") / F.col("__cnt").cast("double")),
        )
    ).cast("long")
    rates = (
        counts.crossJoin(F.broadcast(cmax))
        .withColumn("rate_millionths", rate)
        .select(key_col, "rate_millionths")
    )
    bucket = F.floor(split_bucket(F.col(id_col), salt, 1_000_000)).cast("long")
    return df.join(F.broadcast(rates), key_col).filter(
        bucket < F.col("rate_millionths")
    )


def source_mix_epochs(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    base_rate: float = 1.2,
    salt: int = 11,
) -> DataFrame:
    """Epoch-aware source rebalancing: like ``source_mix`` but rates may
    EXCEED 1.0 — a rare source with rate 2.4 contributes 2 full copies of
    every document plus a deterministic 40% of a third (the "epochs per
    source" semantics of data-mixture recipes that up-sample scarce
    domains). rate_s = base_rate * sqrt(c_max / c_s), uncapped.

    Emits one row per (document, copy) with ``copy`` 0..n; full copies
    need no hashing, the final fractional copy keeps iff the document's
    hash bucket falls under the fractional part. Narrow generate+explode
    over a broadcast rate table — no shuffle of the corpus; output bytes
    scale with the chosen mixture, which is the point.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("__cnt"))
    cmax = counts.agg(F.max("__cnt").alias("__cmax"))
    rate = F.floor(
        F.lit(1_000_000.0 * base_rate)
        * F.sqrt(F.col("__cmax").cast("double") / F.col("__cnt").cast("double"))
    ).cast("long")
    rates = (
        counts.crossJoin(F.broadcast(cmax))
        .withColumn("rate_millionths", rate)
        .select(key_col, "rate_millionths")
    )
    bucket = F.floor(split_bucket(F.col(id_col), salt, 1_000_000)).cast("long")
    full = (F.col("rate_millionths") / F.lit(1_000_000)).cast("long")
    frac = F.col("rate_millionths") % F.lit(1_000_000)
    return (
        df.join(F.broadcast(rates), key_col)
        .withColumn(
            "copy", F.explode_outer(F.sequence(F.lit(0).cast("long"), full))
        )
        .filter(F.col("copy").isNotNull())
        .filter((F.col("copy") < full) | (bucket < frac))
    )


def chunk_documents(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the standard pre-tokenization step of a training-data pipeline
    (context-window packing, embedding indexing). Chunk c starts at
    ``c * (size - overlap)``; the final chunk may be short; an empty
    document yields one empty chunk (so no document silently vanishes).

    Pure Catalyst: ``sequence`` of chunk starts → ``transform`` substring
    → ``posexplode``. Narrow, no shuffle, O(bytes) — at corpus scale this
    is a map-only stage that chains onto the scan.

    Returns (id, chunk_id, chunk_text, chunk_chars).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    staged = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("__text")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("__text") - 1, F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.col("__text").substr(s + 1, F.lit(size))
    )
    return staged.select(
        "id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).withColumn("chunk_chars", F.length("chunk_text"))


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    id_col: str = "doc_id",
    seq_len: int = 512,
    ids_per_bucket: int = 4096,
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are concatenated in
    ``id_col`` order into one global token stream and cut every
    ``seq_len`` tokens — the standard packing of LM training data.
    Returns per document: (id, n_tokens, seq_id, seq_offset, n_seqs)
    where ``seq_id`` is the training sequence its first token lands in,
    ``seq_offset`` the position within it, and ``n_seqs`` how many
    sequences the document spans.

    The global prefix sum is computed as a DISTRIBUTED two-phase scan —
    never a single-partition global window: intra-bucket running sums
    under ``partitionBy(bucket)`` run fully parallel, the per-bucket
    totals (one row per ~``ids_per_bucket`` documents — KBs at corpus
    scale) take the only ordered single-partition window, and their
    running offsets broadcast-join back. Exactly equal to the naive
    global cumulative sum, at the cost of one small shuffle + broadcast.
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
    ).withColumn("__b", F.floor(F.col("id") / ids_per_bucket).cast("long"))
    w_intra = (
        Window.partitionBy("__b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = staged.withColumn("__cum_in", F.sum("n_tokens").over(w_intra))
    totals = staged.groupBy("__b").agg(F.sum("n_tokens").alias("__t"))
    w_prev = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_prev), F.lit(0)).alias("__off")
    )
    # exact int64 `div` arithmetic end-to-end — float division of a
    # ~1e14-token stream position by seq_len can land a boundary token in
    # the wrong sequence; integer div cannot
    joined = (
        intra.join(F.broadcast(offsets), "__b")
        .withColumn("__end", (F.col("__off") + F.col("__cum_in")).cast("long"))
        .withColumn("__start", (F.col("__end") - F.col("n_tokens")).cast("long"))
    )
    L = int(seq_len)
    return joined.select(
        "id",
        "n_tokens",
        F.expr(f"__start div {L}").alias("seq_id"),
        F.expr(f"__start % {L}").alias("seq_offset"),
        F.expr(f"((__end - 1) div {L}) - (__start div {L}) + 1").alias("n_seqs"),
    )


# --------------------------------------------------------------------------
# embedding quantization
# --------------------------------------------------------------------------

def quantize_embedding(
    vec: Column, bits: int = 8
) -> tuple[Column, Column]:
    """Symmetric per-vector int quantization: scale = max|v|, code =
    floor(v/scale·(2^(bits-1)-1) + 0.5) — floor(x+0.5) instead of round()
    because round-half modes differ across engines while floor is exact.

    Returns (scale, codes). Dequantize with ``code·scale/qmax``. The
    compressed column is ~8× smaller than float64 arrays — the difference
    between shipping 256 GB and 2 TB of embeddings through an ANN build at
    corpus scale.
    """
    qmax = (1 << (bits - 1)) - 1
    # widen float32 embeddings to double FIRST: all downstream arithmetic
    # is then float64 end-to-end, matching any engine that computes on
    # doubles (float32 division + round near code boundaries diverges)
    vecd = vec.cast("array<double>")
    scale = F.array_max(F.transform(vecd, lambda v: F.abs(v)))
    # nullif guards the all-zero vector (0/0 diverges across engines)
    codes = F.transform(
        vecd,
        lambda v: F.floor(
            v / F.nullif(scale, F.lit(0.0)) * F.lit(qmax) + F.lit(0.5)
        ).cast("int"),
    )
    return scale, codes


# --------------------------------------------------------------------------
# weighted sampling (Efraimidis–Spirakis A-ES) and content-defined chunking
# --------------------------------------------------------------------------

def weighted_sample_keys(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Append the Efraimidis–Spirakis A-ES sampling key: ``rk = ln(u)/w``
    with ``u ∈ (0,1)`` derived DETERMINISTICALLY from the id (same
    multiplicative hash as ``split_bucket``), so the "random" draw is
    reproducible in any engine and stable across re-runs — the property
    that makes a weighted corpus sample re-derivable instead of an
    artifact you must archive.

    Taking the k LARGEST ``rk`` yields a weighted sample without
    replacement where P(i in sample) follows the A-ES scheme for weights
    ``w_i`` (Efraimidis & Spirakis 2006: keys u^(1/w) — ln-transformed
    here, order-preserving since ln is monotone). Rows with w ≤ 0 or NULL
    get rk = NULL and never sample.

    Scale shape: pure narrow projection; the subsequent top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of k rows),
    never a full sort.
    """
    h = ((F.col(id_col).cast("long") + F.lit(salt)) * F.lit(_MULT)) % F.lit(_MOD)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    w = F.col(weight_col).cast("double")
    rk = F.log(u) / F.when(w > 0, w)
    return df.withColumn("rk", rk)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """The k rows with the largest A-ES keys (weighted sample without
    replacement); deterministic for a given (corpus, salt)."""
    keyed = weighted_sample_keys(df, weight_col, id_col, salt)
    return keyed.where(F.col("rk").isNotNull()).orderBy(
        F.col("rk").desc(), F.col(id_col)
    ).limit(k)


def cdc_chunks(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    divisor: int = 32,
    min_len: int = 8,
) -> DataFrame:
    """Content-defined chunking (rsync/LBFS-style): split each document at
    positions where the rolling k-gram hash ≡ 0 (mod ``divisor``), then
    fingerprint each chunk. Because boundaries depend only on LOCAL
    content, an insertion early in a document shifts every fixed-size
    block but leaves all later CDC chunks identical — the property that
    lets chunk-level dedup find shared passages exact dedup misses.

    ``min_len`` suppresses boundaries closer than that to the previous one
    (the standard min-chunk guard; expected chunk ≈ ``min_len`` +
    ``divisor`` chars). The k-gram hash is the exact-int64 polynomial of
    ``winnow_fingerprints`` — every boundary decision and chunk hash is
    bit-reproducible by any engine (oracle-checkable), unlike xxhash
    sketches.

    Implementation (round 8): normalization stays a JVM expression (Java
    regex/lowercase semantics — the recorded contract); the rolling
    hashes, greedy boundary selection and chunk head hashes run as a
    numpy pass inside one Arrow ``mapInPandas`` (the same CHAR-granular
    vectorization as ``winnow_fingerprints`` — the Catalyst HOF form
    measured 9.4 s at sf0.1, this measures ~1 s, bit-identical values
    verified against the tests' independent ``_py_cdc`` reference and
    the DuckDB x46 oracle).  Map-only: no shuffle.  Returns one row per
    chunk: ``(id, chunk_idx, chunk_hash, chunk_len)`` where
    ``chunk_hash`` is the polynomial hash of the chunk's first
    min(5, len) chars combined with its length (collision-safe enough
    for audit; dedup joins re-verify on content as elsewhere in this
    repo).
    """
    import pandas as pd

    norm = F.regexp_replace(F.lower(F.col(content_col)), r"\s+", " ")
    staged = df.select(F.col(id_col).alias("id"), norm.alias("__norm"))
    weights = np.array([_B ** (k - 1 - j) for j in range(k)], dtype=np.int64)

    def batches(it):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in it:
            ids, idxs, hs, lens = [], [], [], []
            for id_, s in zip(pdf["id"], pdf["__norm"]):
                if not s:  # empty or null text -> no chunks
                    continue
                cp = np.frombuffer(
                    s.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                n = len(cp)
                ng = max(n - (k - 1), 1)
                # chars past the end contribute 0 (partial-gram hash for
                # short docs — same convention as winnow_fingerprints)
                padded = np.zeros(ng + k - 1, dtype=np.int64)
                padded[: min(n, ng + k - 1)] = cp[: ng + k - 1]
                h = sliding_window_view(padded, k) @ weights
                # candidate boundaries (1-based gram positions), greedy
                # min_len spacing, cut AFTER position b
                last = 0
                starts = [1]
                for i in np.flatnonzero(h % divisor == 0) + 1:
                    if last <= i - min_len:
                        last = int(i)
                        if i + 1 <= n:
                            starts.append(int(i) + 1)
                starts.append(n + 1)  # sentinel: end of document
                for j in range(len(starts) - 1):
                    a, b = starts[j] - 1, starts[j + 1] - 1  # 0-based
                    # head capped at 5 chars so hash*1_000_003 stays
                    # exact in int64 (255·Σ257^j for j<5 ≈ 1.1e12;
                    # ×1e6 ≈ 1.1e18 < 2^63)
                    head = 0
                    for c in cp[a : min(a + 5, b)]:
                        head = head * _B + int(c)
                    ids.append(id_)
                    idxs.append(j + 1)
                    hs.append(head * 1_000_003 + (b - a))
                    lens.append(b - a)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "chunk_idx": pd.array(idxs, dtype="int64"),
                    "chunk_hash": pd.array(hs, dtype="int64"),
                    "chunk_len": pd.array(lens, dtype="int32"),
                }
            )

    return staged.mapInPandas(
        batches,
        "id BIGINT, chunk_idx BIGINT, chunk_hash BIGINT, chunk_len INT",
    )


def seeded_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0, bucket_bits: int = 8
) -> DataFrame:
    """Deterministic seeded corpus shuffle — the training-order
    assignment every run must be able to REPRODUCE (resume after
    preemption, replay a loss spike, ablate data order): each row gets
    ``shuffle_pos`` (1-based) by sorting on an exact-integer
    multiply-xorshift-multiply key (reproducible in any engine — the
    x84 oracle recomputes it in SQL), ties broken by id.

    Distributed WITHOUT a global window: the key's TOP ``bucket_bits``
    bits bucket the rows (a pure function — unlike sampled range
    boundaries, deterministic across executions and retries, so no
    checkpoint is needed), and because buckets are the key's most
    significant bits, bucket order IS key order: global position =
    (exact prefix-sum offset of the bucket, from a tiny 2^bits-row
    count collect) + the within-bucket rank. One hash exchange on the
    bucket; every window partition is ~corpus/2^bits — at 100 TB raise
    ``bucket_bits`` so shards fit executors (multiplicative hashing
    keeps buckets uniform regardless of id distribution).
    """
    # two-round mix: the affine pass alone would make every seed's
    # order a cyclic ROTATION of one fixed permutation (key(id, s) =
    # key(id, 0) + s·MULT mod 2^32 — a constant offset), so a xorshift
    # breaks the additive structure before a second (16-bit, overflow-
    # safe) multiply. Exact int64 arithmetic end to end — the oracle
    # repeats it verbatim in SQL.
    #
    # Domain guard: the key math assumes a non-negative (id + seed)
    # (Java's % keeps the dividend sign, so a negative dividend would
    # shiftright a negative key into bucket garbage) and
    # (id + seed)·MULT must stay inside int64 (Java wraps SILENTLY past
    # 2^63; DuckDB would error, so a wrap is also an oracle divergence).
    # The seed is validated driver-side, the id map-side (no extra
    # pass). Past ~3.4e9 ids, rebase ids or switch to a 64-bit splitmix.
    if not 0 <= seed <= (2**63 - 1) // _MULT:
        raise ValueError(
            f"seeded_shuffle: seed must be in [0, {(2**63 - 1) // _MULT}], "
            f"got {seed} (a negative seed sign-garbles the bucket keys)"
        )
    id_max = (2**63 - 1) // _MULT - seed
    raw = F.col(id_col).cast("long")
    guarded = F.when(
        (raw < 0) | (raw > F.lit(id_max)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"seeded_shuffle: {id_col} out of domain "
                    f"[0, {id_max}]: "
                ),
                raw.cast("string"),
            )
        ).cast("long"),
    ).otherwise(raw)
    k1 = ((guarded + F.lit(seed)) * F.lit(_MULT)) % F.lit(_MOD)
    k2 = k1.bitwiseXOR(F.shiftright(k1, 16))
    key = (k2 * F.lit(40503)) % F.lit(_MOD)
    shift = 32 - bucket_bits
    staged = df.withColumn("shuffle_key", key).withColumn(
        "__bkt", F.shiftright(F.col("shuffle_key"), shift)
    )
    counts = {
        r["__bkt"]: r["n"]
        for r in staged.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ),
        F.col("__bkt"),
    )
    w = Window.partitionBy("__bkt").orderBy("shuffle_key", F.col(id_col))
    return (
        staged.withColumn(
            # long, not int: positions past 2^31 rows must not wrap
            "shuffle_pos",
            (off_expr + F.row_number().over(w)).cast("long"),
        )
        .drop("__bkt")
    )


def length_bucketed_batches(
    df: DataFrame,
    length_col: str,
    id_col: str = "doc_id",
    batch_size: int = 32,
    max_distinct_lengths: int = 100_000,
) -> DataFrame:
    """Length-bucketed (dynamic) batching: group similar-length rows so
    per-batch padding-to-max is minimal — the standard throughput
    optimization for sequence training/inference. Rows sort by
    (length DESC, id), consecutive runs of ``batch_size`` form a batch;
    each row reports its batch id, the batch's padded length (its max)
    and the row's own padding waste. Σ waste over naive random batching
    vs this ordering is the measured win.

    Distributed WITHOUT a global window (a bare ``Window.orderBy``
    compiles to Exchange SinglePartition — the whole corpus through one
    task): the exact global rank is the per-length prefix-sum offset
    (one tiny count-by-length collect — a token-count domain is a few
    thousand distinct values; pre-quantize continuous lengths first) +
    the within-length rank, so the only exchange partitions by the
    length value. The batch-max aggregation is a skinny
    (batch_id, max) self-join, broadcast by AQE.
    """
    counts = {
        r["__len"]: r["n"]
        for r in df.select(F.col(length_col).alias("__len"))
        .groupBy("__len")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if len(counts) > max_distinct_lengths:
        # a continuous / un-quantized length column would otherwise
        # become an unbounded create_map literal (planner blow-up) —
        # fail loudly instead of building it
        raise ValueError(
            f"length_bucketed_batches: {len(counts)} distinct "
            f"{length_col!r} values exceeds max_distinct_lengths="
            f"{max_distinct_lengths}; pre-quantize the length column "
            f"(e.g. floor(len/16)*16) or raise the cap"
        )
    offsets, acc = {}, 0
    for length in sorted(counts, reverse=True):
        offsets[length] = acc
        acc += counts[length]
    off_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col(length_col),
    )
    w = Window.partitionBy(length_col).orderBy(F.col(id_col))
    ranked = df.withColumn(
        "batch_id",
        ((off_expr + F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    maxes = ranked.groupBy("batch_id").agg(
        F.max(length_col).alias("batch_max")
    )
    return ranked.join(maxes, "batch_id").withColumn(
        "padding", (F.col("batch_max") - F.col(length_col)).cast("long")
    )


def token_budget_sample(
    df: DataFrame,
    length_col: str,
    id_col: str = "doc_id",
    budget: int = 100_000,
    seed: int = 0,
    bucket_bits: int = 8,
) -> DataFrame:
    """Draw a fixed TOKEN budget from the corpus: walk documents in the
    seeded shuffle order (``seeded_shuffle``) and keep each document
    whose running token total BEFORE it is still under ``budget`` — how
    an N-token training corpus is actually cut from a larger pool
    (deterministic, so the draw is reproducible and extendable: a
    bigger budget keeps a superset).

    Returns kept rows with ``shuffle_pos``, ``tokens_before`` (exact
    running sum of earlier documents' lengths) — the boundary document
    may overshoot the budget, matching the usual "stop after the doc
    that crosses N" semantics.

    Exact integer running sums, distributed with the same top-bit
    bucket + prefix-sum-offset pattern as ``seeded_shuffle``: bucket
    token totals (one tiny collect) give each bucket's starting total,
    a within-bucket window adds the local running sum, and the filter
    is a map-side predicate — no global window anywhere.
    """
    shuffled = seeded_shuffle(df, id_col, seed, bucket_bits)
    shift = 32 - bucket_bits
    staged = shuffled.withColumn(
        "__bkt", F.shiftright(F.col("shuffle_key"), shift)
    )
    totals = {
        r["__bkt"]: r["t"]
        for r in staged.groupBy("__bkt")
        .agg(F.sum(F.col(length_col).cast("long")).alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    off_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col("__bkt"),
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("shuffle_key", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(
        F.sum(F.col(length_col).cast("long")).over(w), F.lit(0)
    )
    return (
        staged.withColumn("tokens_before", (off_expr + running).cast("long"))
        .filter(F.col("tokens_before") < budget)
        .drop("__bkt")
    )


def corpus_line_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 1,
    min_chars: int = 10,
) -> DataFrame:
    """CROSS-CORPUS duplicate-line removal (RefinedWeb / CCNet paragraph
    dedup, Dolma's line-level filter): a line appearing in more than
    ``max_docs`` DISTINCT documents is boilerplate (navigation, cookie
    banners, licence blocks) and is removed from EVERY document; lines
    shorter than ``min_chars`` collide by chance and are exempt. This is
    the corpus-global complement of the per-document C4 line rules
    (``functions.text.c4_clean``) — deterministic set semantics (the
    threshold form), not first-seen-wins, so the result is
    layout-invariant.

    Scale shape: lines explode to skinny (doc, pos, fp) rows; the
    frequent-line set is one DISTINCT + one fp-keyed count shuffle; the
    removal flag attaches by fp equi-join (the frequent set is usually
    broadcast-sized — true boilerplate — but the join stays planner-
    chosen because it need not be); documents reassemble with one
    doc-keyed shuffle (array_sort over collected (pos, line) structs —
    exact original order). Fingerprints never reach the output, so the
    oracle re-derives everything from the line STRINGS (the x51
    convention) — which means the oracle parity ASSUMES no 64-bit
    fingerprint collision between two distinct lines: a colliding pair
    would pool their distinct-doc counts here (possibly deleting an
    innocent line the string-keyed oracle keeps). The standard
    fingerprint-dedup trade (x5's hashed-shingle Jaccard makes the same
    one): P(any collision) ≈ n²/2^65 — ~3e-8 at a billion distinct
    lines; join on (fp, line) instead if a corpus ever needs it
    harmless.

    Returns (doc_id, n_lines, n_removed, clean_text); a document whose
    every line was removed yields ``clean_text = ''``.
    """
    staged = df.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("__text")
    )
    occ = (
        staged.select(
            "doc_id",
            F.posexplode_outer(F.split(F.col("__text"), "\n")).alias(
                "pos", "line"
            ),
        )
        .filter(F.col("line").isNotNull())
        .select(
            "doc_id",
            "pos",
            "line",
            (F.length("line") >= min_chars).alias("__el"),
            F.xxhash64(F.col("line")).alias("__fp"),
        )
    )
    freq = (
        occ.where(F.col("__el"))
        .select("__fp", "doc_id")
        .distinct()
        .groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") > max_docs)
        .select("__fp")
    )
    kept = (
        occ.join(freq.withColumn("__dup", F.lit(True)), "__fp", "left")
        .where(~(F.col("__el") & F.coalesce(F.col("__dup"), F.lit(False))))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__nkept"),
    )
    base = staged.select(
        "doc_id", F.size(F.split(F.col("__text"), "\n")).alias("n_lines")
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("__nkept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def leakfree_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Contamination-aware train/val/test split: every near-duplicate
    CLUSTER is assigned to one split WHOLE, so no near-dup pair ever
    straddles the train/eval boundary — the leakage a per-document
    ``hash_split`` cannot prevent (a document and its near-copy hash
    independently, and ~2·p_eval of duplicate mass lands across the
    boundary).

    The cluster key is the exact connected-component label of the pair
    graph (minimum reachable id, ``dedup.connected_components``);
    unpaired documents key by their own id. Assignment then applies the
    SAME exact int64 multiplicative hash as ``hash_split`` to the
    cluster key — stable across re-runs and incremental batches, so
    eval membership never churns and a future batch's near-dup of an
    eval document lands in eval, not train.

    Scale shape: CC iterates skinny (id, label) joins over the PAIR
    graph only (edges, never text/payloads); the label table joins back
    to the corpus by id (one shuffle); the split itself is a narrow
    projection. Returns ``df`` + (cluster_key, bucket, split).

    Id-range precondition (inherited from ``split_bucket``, which this
    feeds ``cluster_key`` into): the exact multiplicative hash needs
    ``(key + salt) * 2654435761 < 2^63``, i.e. keys below ~3.4e9 —
    web-scale ids beyond that wrap int64 and scramble the assignment
    without error. Mask wider ids to 32 bits (identically on every
    batch) before splitting, or renumber; ``split_bucket`` documents
    the same bound.
    """
    from modis_aggregation_spark.operators.dedup import connected_components

    comp = connected_components(pairs, a_col, b_col)
    keyed = (
        df.join(
            comp.select(
                F.col("id").alias(id_col), F.col("comp").alias("__comp")
            ),
            id_col,
            "left",
        )
        .withColumn(
            "cluster_key",
            F.coalesce(F.col("__comp"), F.col(id_col).cast("long")),
        )
        .drop("__comp")
    )
    return hash_split(keyed, "cluster_key", weights, salt)
