"""Similarity search over embedding columns (ARRAY<FLOAT>).

* ``cosine_topk``      — exact brute-force top-k: broadcast the (small)
  query set against the corpus, JVM-side dot products, per-query window
  top-k. The correctness baseline; O(|corpus| x |queries|) but fully
  distributed and shuffle-light (one shuffle for the top-k window, bounded
  by |queries| x k after per-partition pre-truncation).
* ``ivf_assign`` / ``ivf_topk`` — IVF scale path: k-means centroids (fit on
  a driver-side SAMPLE, deterministic), corpus partitioned by nearest
  centroid, queries probe only ``nprobe`` nearest lists — at 100 TB this
  prunes the scan to nprobe/nlist of the corpus; the centroid assignment
  is a vectorized Pandas UDF (numpy matmul per Arrow batch — the one place
  Python earns its keep here).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from modis_aggregation_spark.functions.layout import spread_small_scan
from modis_aggregation_spark.operators.dedup import cosine


def _norm(emb_col: str) -> Column:
    """Euclidean norm of an ARRAY<DOUBLE> column — the exact fold
    ``cosine()`` uses, split out so join operators can stage it per SIDE
    (once per row) instead of re-evaluating it per PAIR."""
    return F.sqrt(
        F.aggregate(F.col(emb_col), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _cosine_staged(a: str, b: str, na: str, nb: str) -> Column:
    """``cosine()`` with the two norms read from pre-staged columns.
    Identical float operation sequence (dot fold, na*nb, nullif, divide)
    — bit-identical to the inline form, minus the per-pair norm folds."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / F.nullif(F.col(na) * F.col(nb), F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force).

    ``queries``: (query_id, embedding). Broadcast-joined against the
    corpus; ties broken by neighbor id for determinism.
    """
    # norms staged per SIDE, below the join (round 12, guide §3.2): the
    # inline `cosine()` helper evaluates BOTH norm folds per PAIR, so the
    # corpus norm was recomputed once per query and the query norm once
    # per corpus row. Staging them as real columns under the join boundary
    # (which CollapseProject cannot cross) computes each exactly once per
    # row; per-pair work collapses to the dot product. Same fold, same
    # order, same nullif — the double is bit-identical.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("__ce"),
    ).withColumn("__cn", _norm("__ce"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    ).withColumn("__qn", _norm("__qe"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine_staged("__ce", "__qe", "__cn", "__qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # + 0.0 folds -0.0 to +0.0 (CLAUDE.md rule 8): an
            # unthresholded cosine can round to -0.0 on one engine only
            (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"),
            "rank",
        )
    )


def cosine_pairs_exact(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    block_size: int = 4096,
    dim: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold (id1 < id2).

    This is the verification baseline for the approximate scale path
    (``operators.dedup.embedding_pairs`` — random-hyperplane LSH): exact
    all-pairs is inherently O(n²) dot products, so it is only runnable on
    a corpus slice, a candidate pool, or an eval set. The join itself is
    still distributed and shuffle-skinny: rows are blocked on ``id div
    block_size``, each block's unit vectors ship ONCE per partner block
    as a collect_list'd matrix (n·nblocks rows through the exchange, not
    n² pair payloads), and each equi-joined (b1, b2) task scores a
    block×block outer product in numpy — no cartesian task, no per-pair
    Arrow transfer. At corpus scale use ``embedding_pairs`` and
    reserve this for auditing its recall on a sample. Zero-norm vectors
    have no defined cosine and are dropped; NULL embeddings likewise
    (a NULL array makes the staged norm NULL, which fails the ``> 0``
    filter).  Embeddings must be FIXED-DIMENSION: the numpy verifier
    stacks each Arrow batch into one (rows, dim) matrix, so a
    wrong-length vector would raise inside the task instead of yielding
    a silent NULL cosine.  Pass ``dim`` to pre-filter mismatched rows
    JVM-side (the same guard ``operators.dedup.embedding_pairs`` applies
    per row in Python); leave it ``None`` only when the source schema
    already guarantees the width.
    """
    # normalize ONCE per row (norm staged as a real column — lambda inputs
    # must be materialized, and an inline norm would re-evaluate per pair):
    # per-pair work then collapses to a single dot product
    staged = df.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__e"),
    )
    if dim is not None:
        staged = staged.where(F.size("__e") == dim)
    unit = (
        staged
        .withColumn(
            "__n",
            F.sqrt(
                F.aggregate(
                    F.col("__e"), F.lit(0.0), lambda acc, v: acc + v * v
                )
            ),
        )
        .where(F.col("__n") > 0)
        .select(
            "__id",
            F.transform(F.col("__e"), lambda v: v / F.col("__n")).alias("__e"),
        )
    )
    # block decomposition is semantics-neutral (every id1<id2 pair lands in
    # exactly one ordered block pair), so block_size is an UPPER bound:
    # shrink it until the id range yields at least defaultParallelism join
    # keys, else a small corpus (one block) funnels the whole O(n²) verify
    # into ONE task (measured 8 s -> ~1 s at sf0.1). At real scale the id
    # range already spans thousands of blocks and the cap never binds.
    max_id = df.agg(F.max(F.col(id_col).cast("long"))).first()[0]
    if max_id is not None:
        p = df.sparkSession.sparkContext.defaultParallelism
        block_size = max(1, min(block_size, (int(max_id) + p) // p))
    # block-matrix form (round 9): the earlier per-pair join shipped BOTH
    # embeddings for every one of the O(n²) pairs through the exchange and
    # the Arrow boundary (~2 GB at sf0.1) — the transfer, not the math,
    # was the whole runtime. Instead each block's unit vectors travel
    # ONCE per partner block as a collect_list'd matrix (n·nblocks rows
    # total), and every (b1, b2) task scores a block×block outer product.
    nblocks = int(max_id // block_size) if max_id is not None else 0
    blocks = (
        unit.select(
            "__id",
            "__e",
            (F.col("__id").cast("long") / block_size).cast("long").alias("__b"),
        )
        .groupBy("__b")
        .agg(F.collect_list(F.struct("__id", "__e")).alias("__rows"))
    )
    # explode each left block to every right block ≥ its own: keeps the
    # join an equi-join (hash-partitioned on block id), never a nested loop
    probes = blocks.select(
        F.col("__b").alias("__b1"),
        F.col("__rows").alias("__rows1"),
        F.explode_outer(F.sequence(F.col("__b"), F.lit(nblocks))).alias("__b2"),
    ).filter(F.col("__b2").isNotNull())
    # merge hint: both sides carry collect_list'd block matrices whose
    # size Catalyst can't estimate (and probes sits below an explode) —
    # a mis-elected broadcast of block matrices is a driver OOM at real
    # corpus sizes. Sort-merge on the block id is safe at every n.
    joined = probes.hint("merge").join(
        blocks.select(
            F.col("__b").alias("__b2"), F.col("__rows").alias("__rows2")
        ),
        "__b2",
    ).select("__rows1", "__rows2")

    # per-pair cosine as broadcast numpy (round 8/9): np.cumsum
    # accumulates LEFT-TO-RIGHT like the expression fold this replaced,
    # so the cosine doubles (and the threshold/rounding decisions made on
    # them) are bit-identical; rounding stays a Spark expression (F.round
    # is HALF_UP, np.round is banker's). Left rows are chunked so the
    # (rows1, rows2, dim) product tensor stays ~64 MB regardless of
    # block_size.
    import pandas as pd

    def verify(it):
        empty = pd.DataFrame(
            {
                "id1": pd.array([], dtype="int64"),
                "id2": pd.array([], dtype="int64"),
                "cosine": pd.array([], dtype="float64"),
            }
        )
        for pdf in it:
            if len(pdf) == 0:
                yield empty
                continue
            for r1, r2 in zip(pdf["__rows1"], pdf["__rows2"]):
                ids1 = np.array([r["__id"] for r in r1], dtype=np.int64)
                ids2 = np.array([r["__id"] for r in r2], dtype=np.int64)
                e1 = np.array([r["__e"] for r in r1], dtype=np.float64)
                e2 = np.array([r["__e"] for r in r2], dtype=np.float64)
                d_ = e1.shape[1]
                step = max(1, (64 << 20) // (8 * max(1, len(ids2) * d_)))
                for lo in range(0, len(ids1), step):
                    hi = lo + step
                    cos = np.cumsum(
                        e1[lo:hi, None, :] * e2[None, :, :], axis=2
                    )[:, :, -1]
                    m = (cos >= threshold) & (
                        ids1[lo:hi, None] < ids2[None, :]
                    )
                    if not m.any():
                        continue
                    i, j = np.nonzero(m)
                    yield pd.DataFrame(
                        {
                            "id1": ids1[lo:hi][i],
                            "id2": ids2[j],
                            "cosine": cos[m],
                        }
                    )
            yield empty

    return joined.mapInPandas(
        verify, "id1 BIGINT, id2 BIGINT, cosine DOUBLE"
    ).select("id1", "id2", F.round("cosine", 6).alias("cosine"))


def lloyd_kmeans(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Plain Lloyd k-means on an in-memory sample (the numpy core of
    ``kmeans_centroids``, shared with ``tools/make_goldens.py`` so the
    committed centroid golden is bit-identical to what the Spark query
    fits at runtime)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for ci in range(len(cents)):
            members = sample[assign == ci]
            if len(members):
                cents[ci] = members.mean(0)
    return cents


def kmeans_centroids(
    df: DataFrame,
    emb_col: str = "embedding",
    nlist: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 5,
    order_col: str | None = None,
) -> np.ndarray:
    """Fit IVF centroids with plain Lloyd k-means on a driver-side sample.

    The sample (not the corpus) is collected — bounded memory regardless of
    corpus size; at 100 TB you'd sample ~1e5 rows the same way. Pass
    ``order_col`` to make the sample (a distributed top-k sort, still
    bounded) — and hence the fitted centroids — exactly reproducible
    across sessions and partition layouts; without it the sample is
    whatever ``limit`` happens to take first.
    """
    proj = df.select(
        F.col(emb_col).cast("array<double>"),
        *([F.col(order_col)] if order_col else []),
    )
    if order_col:
        proj = proj.orderBy(order_col)
    sample = np.array([r[0] for r in proj.limit(sample_rows).collect()])
    return lloyd_kmeans(sample, nlist, iters, seed)


def kmeans_train(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    quant_decimals: int = 3,
) -> DataFrame:
    """FULLY DISTRIBUTED Lloyd k-means — the full-corpus complement to
    ``kmeans_centroids`` (which fits on a bounded driver-side sample).
    No task ever materializes the corpus: each iteration is

    1. broadcast the k×d centroid matrix (KBs) into a vectorized
       Pandas-UDF assignment (numpy matmul per Arrow batch),
    2. posexplode to skinny ``(list_id, pos, micros)`` rows and
       hash-aggregate an EXACT ``sum(int64)/count`` per (cluster,
       coordinate) — map-side partial aggregation reduces the shuffle
       to ``tasks × k × d`` rows no matter the corpus size,
    3. collect the k×d aggregate (≤MB — the model, not the data) and
       form the next centroids on the driver with exact integer
       arithmetic.

    **Determinism by construction — exact integer staging** (the
    unigram_train M-step discipline, ``operators/tokenizer.py``):
    distributed float sums are order-dependent, and round-6 showed
    that rounding an inexact float sum is NOT layout-invariant (a sum
    landing within jitter of a ``x.xxx5`` boundary rounds differently
    under different partitionings — driver hash-fail on
    x75_kmeans_train). Instead each coordinate is quantized UP FRONT
    to integer micros, ``floor(x·1e6 + 0.5)``, an element-wise op with
    one answer everywhere; the shuffle then sums int64, which is
    exact and commutative, so every partition layout produces the
    *identical* integer. The new centroid is rounded to
    ``quant_decimals`` decimals in pure integer arithmetic —
    ``floor(s/(n·sub) + 1/2)`` grid units, computed as the single
    exact floordiv ``(2s + n·sub) // (2·n·sub)`` — and only then
    converted to float64.
    No float op ever touches an aggregate, so the learned model is
    bit-identical on 1 task or 1000 executors and independently
    recomputable (the x75 oracle golden re-derives it with a separate
    loop-based implementation under the same integer contract). Init
    is the k vectors with the smallest ``id_col`` quantized the same
    way; an emptied cluster keeps its previous centroid. int64 bound:
    safe while ``n_rows × max|x| × 1e6 < 9.2e18`` (e.g. 1e12 unit-norm
    vectors).

    Returns the model as ``(list_id, size, pos, val)`` rows — sizes
    from a final assignment pass under the converged centroids.
    """
    scale = 10 ** quant_decimals          # centroid grid (milli for q=3)
    sub = 10 ** (6 - quant_decimals)      # micros per grid unit
    emb = df.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__e"),
    )
    emb = emb.persist()
    try:
        init = emb.orderBy("__id").limit(k).collect()

        def _qgrid(x: float) -> int:
            # round(x * scale) half-up-toward-+inf, exact: the same
            # floor(x·scale + 0.5) the Spark-side micros staging uses.
            return math.floor(x * scale + 0.5)

        cents_q = [
            [_qgrid(float(v)) for v in r["__e"]] for r in init
        ]  # integer grid units — the authoritative model state
        d = len(cents_q[0])

        def _floats(cq: list[list[int]]) -> np.ndarray:
            return np.array(cq, dtype=np.float64) / scale

        def assigned(cur: np.ndarray) -> DataFrame:
            @pandas_udf("int")
            def _assign(embs: pd.Series) -> pd.Series:
                m = np.stack(embs.to_numpy()).astype(np.float64)
                # direct ||x-c||^2, the SAME algebraic form (and float
                # op sequence) as the independent x75 golden — the
                # expanded ||c||^2 - 2x.c form rounds differently and
                # could flip assignments on near-ties between the two
                # implementations
                dist = ((m[:, None, :] - cur[None, :, :]) ** 2).sum(-1)
                return pd.Series(dist.argmin(1).astype(np.int32))

            return emb.withColumn("__list", _assign(F.col("__e")))

        # element-wise micros: floor(v·1e6 + 0.5) — NOT F.round (Spark
        # HALF_UP vs Python half-even would diverge on exact .5)
        micros = F.floor(F.col("v") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
            "long"
        )
        for _ in range(iters):
            agg = (
                assigned(_floats(cents_q))
                .select("__list", F.posexplode("__e").alias("pos", "v"))
                .groupBy("__list", "pos")
                .agg(F.sum(micros).alias("s"), F.count("v").alias("n"))
                .collect()
            )
            sums = [[0] * d for _ in range(k)]
            counts = [[0] * d for _ in range(k)]
            for r in agg:
                sums[r["__list"]][r["pos"]] = int(r["s"])
                counts[r["__list"]][r["pos"]] = int(r["n"])
            for ci in range(k):
                n = counts[ci][0]
                if any(c != n for c in counts[ci]):
                    raise ValueError(
                        f"kmeans_train: ragged/NULL embedding elements in "
                        f"cluster {ci} (per-coordinate counts {counts[ci]})"
                    )
                if n:
                    # round(s / (n·sub·scale)) half-up in exact ints:
                    # floor(s/(n·sub) + 1/2) grid units
                    den = n * sub
                    cents_q[ci] = [
                        (2 * s + den) // (2 * den) for s in sums[ci]
                    ]

        cents = _floats(cents_q)
        sizes = dict(
            (r["__list"], r["n"])
            for r in assigned(cents).groupBy("__list").agg(
                F.count("*").alias("n")
            ).collect()
        )
        spark = df.sparkSession
        rows = [
            (int(li), int(sizes.get(li, 0)), int(pos), float(val))
            for li in range(len(cents))
            for pos, val in enumerate(cents[li])
        ]
        return spark.createDataFrame(
            rows, "list_id INT, size BIGINT, pos INT, val DOUBLE"
        )
    finally:
        emb.unpersist()


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "list_id",
) -> DataFrame:
    """Attach nearest-centroid list id (vectorized Pandas UDF, Arrow batches)."""
    cents = centroids.astype(np.float64)

    @pandas_udf("int")
    def _assign(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.to_numpy()).astype(np.float64)
        # argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
        d = (cents**2).sum(1)[None, :] - 2.0 * m @ cents.T
        return pd.Series(d.argmin(1).astype(np.int32))

    return df.withColumn(out_col, _assign(F.col(emb_col).cast("array<double>")))


def mean_embedding(
    df: DataFrame,
    label_col: str = "label",
    emb_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """Element-wise mean embedding per label (class centroids / mean
    pooling): posexplode → per-(label, position) avg → re-assemble ordered
    array. Two narrow-keyed hash aggregations, no UDF; shuffle volume is
    labels × dim rows — the standard distributed formulation that avoids
    collecting vectors anywhere.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("pos", "v"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.avg("v").alias("m"), F.count("v").alias("n")
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias(out_col),
            F.max("n").alias("n_vectors"),
        )
    )


def pq_fit_sample(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Product-quantization codebooks from an in-memory sample: the dim
    axis splits into ``m`` contiguous subspaces and each gets its own
    k-means codebook via the shared ``lloyd_kmeans`` core (so
    tools/make_goldens.py reproduces the floats bit-identically).
    Returns shape (m, k, dim//m). ``dim`` must divide evenly by ``m`` —
    a silent ``//`` would drop the trailing dimensions from every
    distance."""
    if sample.shape[1] % m:
        raise ValueError(
            f"embedding dim {sample.shape[1]} is not divisible by m={m}"
        )
    dsub = sample.shape[1] // m
    return np.stack(
        [
            lloyd_kmeans(
                np.ascontiguousarray(sample[:, s * dsub : (s + 1) * dsub]),
                k,
                iters,
                seed,
            )
            for s in range(m)
        ]
    )


def pq_codebooks(
    df: DataFrame,
    emb_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_rows: int = 2000,
    iters: int = 10,
    seed: int = 5,
    order_col: str | None = None,
) -> np.ndarray:
    """Fit PQ codebooks on a bounded driver-side sample (same sampling
    contract as ``kmeans_centroids``: pass ``order_col`` for exact
    reproducibility across sessions/partitionings)."""
    proj = df.select(
        F.col(emb_col).cast("array<double>"),
        *([F.col(order_col)] if order_col else []),
    )
    if order_col:
        proj = proj.orderBy(order_col)
    sample = np.array([r[0] for r in proj.limit(sample_rows).collect()])
    return pq_fit_sample(sample, m, k, iters, seed)


def pq_assign(
    df: DataFrame,
    codebooks: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoding: each vector becomes ``m`` codes
    (nearest codeword per subspace — ties to the lowest code, matching
    numpy argmin) plus the per-subspace Euclidean residual. Output is one
    row per (vec_id, sub) — ``(vec_id, sub, code, sub_dist)`` — because
    the driver's canonicalizer cannot hash array cells.

    At 64-dim float32 → 8×4-bit-to-8-bit codes this is a 32× compression
    of the embedding store; asymmetric-distance search then scans codes
    with per-query lookup tables instead of raw vectors.

    Scale shape: the fit is a bounded driver sample (constant in corpus
    size); encoding is MAP-ONLY — a vectorized Pandas UDF over Arrow
    batches (one (n, k) distance matrix per subspace per batch), no
    shuffle at all until the caller aggregates. The codebook (m·k·dsub
    doubles) rides inside the UDF closure — KBs, broadcast with the task.
    """
    m, k, dsub = codebooks.shape
    cb = codebooks.astype(np.float64)

    @pandas_udf("array<struct<sub:int,code:int,sub_dist:double>>")
    def _enc(embs: pd.Series) -> pd.Series:
        X = np.stack(embs.to_numpy()).astype(np.float64)
        if X.shape[1] != m * dsub:
            raise ValueError(
                f"embedding dim {X.shape[1]} != codebook dim {m * dsub}"
            )
        n = len(X)
        codes = np.empty((n, m), dtype=np.int32)
        dists = np.empty((n, m), dtype=np.float64)
        for s in range(m):
            xs = X[:, s * dsub : (s + 1) * dsub]
            d2 = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
            c = d2.argmin(1)
            codes[:, s] = c
            dists[:, s] = np.sqrt(d2[np.arange(n), c])
        return pd.Series(
            [
                [
                    {"sub": int(s), "code": int(codes[i, s]),
                     "sub_dist": float(dists[i, s])}
                    for s in range(m)
                ]
                for i in range(n)
            ]
        )

    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            _enc(F.col(emb_col).cast("array<double>")).alias("__pq"),
        )
        .select("vec_id", F.explode_outer("__pq").alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            "vec_id",
            F.col("e.sub").alias("sub"),
            F.col("e.code").alias("code"),
            F.col("e.sub_dist").alias("sub_dist"),
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query build the
    m×k lookup table ``lut[sub][code] = ||q_sub − codeword||²``, then the
    approximate squared distance to a database vector is the sum of m
    table lookups over its codes — the database vectors themselves are
    never touched.

    ``codes``: (vec_id, sub, code) rows from ``pq_assign``. Output:
    (query_id, neighbor_id, adist, rank) ascending by approximate
    distance (ties by neighbor id), self-matches excluded.

    Scale shape: the LUT side is |queries|·m·k rows — built by
    crossJoining the (tiny, literal) codebook frame against the query set
    and BROADCAST into the codes join, so the 32×-compressed codes table
    never shuffles for scoring; per-(query, vector) summation is a hash
    agg whose map-side combine collapses the m rows immediately; the
    final top-k is a per-query window (WindowGroupLimit pushes rank ≤ k
    below the exchange). This is the search half of the standard IVF-PQ
    layout — compose with ``ivf_build``'s list_id partition pruning to
    also bound WHICH codes are scanned.
    """
    m, kk, dsub = codebooks.shape
    spark = codes.sparkSession
    cb_rows = [
        (int(s), int(c), [float(v) for v in codebooks[s, c]])
        for s in range(m)
        for c in range(kk)
    ]
    cb = spark.createDataFrame(cb_rows, ["sub", "code", "__w"])
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    # per-(query, sub, code) squared distance, all JVM-side: slice the
    # query vector by the codebook row's sub index and fold the squared
    # difference (single-param lambdas over materialized columns)
    qsub = F.slice(F.col("__qe"), F.col("sub") * dsub + 1, dsub)
    luts = (
        qa.crossJoin(F.broadcast(cb))
        .withColumn("__qs", qsub)
        .select(
            "query_id",
            "sub",
            "code",
            F.aggregate(
                F.zip_with(F.col("__qs"), F.col("__w"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("__d2"),
        )
    )
    scored = (
        codes.join(F.broadcast(luts), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("__d2").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("neighbor_id"))
    # full-precision adist — contract rounding belongs to the query layer
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def semdedup(
    df: DataFrame,
    centroids: np.ndarray,
    tau: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    corpus by nearest k-means centroid, find within-cluster pairs with
    cosine >= ``tau``, and for each such pair DROP the member closer to
    its cluster centroid (the paper's keep-low-centroid-similarity rule —
    the retained example is the more "extreme" of the two; ties break by
    dropping the higher id).

    Output: one row per NON-ZERO-NORM input vector — (vec_id, list_id,
    cent_cos, keep) with ``cent_cos`` the cosine to the assigned centroid
    and ``keep`` false iff some same-cluster neighbor at >= tau dominates
    it. Zero-norm vectors have no defined cosine and are dropped up front
    (the x52 oracle applies the same filter).

    Scale shape: clustering makes the quadratic pair search LOCAL to each
    cluster — Σ|cluster|² instead of n², controlled by nlist (the paper
    runs n/nlist ≈ 1e4 per cluster at web scale). The self-join keys on
    list_id and carries the (normalized) vector payload — candidate count
    >> corpus size here, so carrying beats fetch-per-candidate (same call
    as ``cosine_pairs_exact``); per-pair work is one vectorized numpy
    dot over the Arrow candidate batch.
    The drop set is per-vector booleans via a left anti-ish flag join
    keyed by id — never collected.
    """
    cents = centroids.astype(np.float64)

    # one vectorized pass assigns the list AND computes the cosine to the
    # assigned centroid (a literal per-list when-chain would embed nlist
    # full centroid arrays in the plan — fine at nlist=8, codegen death at
    # the paper's web-scale nlist ~ n/1e4; this scales to any nlist)
    @pandas_udf("struct<list_id:int,cent_cos:double>")
    def _assign_cos(embs: pd.Series) -> pd.DataFrame:
        x = np.stack(embs.to_numpy()).astype(np.float64)
        d = (cents**2).sum(1)[None, :] - 2.0 * x @ cents.T
        li = d.argmin(1)
        csel = cents[li]
        den = np.linalg.norm(x, axis=1) * np.linalg.norm(csel, axis=1)
        cc = (x * csel).sum(1) / den
        return pd.DataFrame({"list_id": li.astype(np.int32), "cent_cos": cc})

    scored = (
        spread_small_scan(
            df.select(
                F.col(id_col).alias("__id"),
                F.col(emb_col).cast("array<double>").alias("__e"),
            )
        )
        .withColumn(
            "__n",
            F.sqrt(F.aggregate(F.col("__e"), F.lit(0.0), lambda acc, v: acc + v * v)),
        )
        .where(F.col("__n") > 0)
        .withColumn("__ac", _assign_cos(F.col("__e")))
        .select(
            "__id",
            F.col("__ac.list_id").alias("list_id"),
            F.col("__ac.cent_cos").alias("cent_cos"),
            F.transform(F.col("__e"), lambda v: v / F.col("__n")).alias("__u"),
        )
    )

    # within-cluster pair scan per cluster group (applyInPandas): the
    # corpus crosses the shuffle and the Arrow boundary ONCE (n skinny
    # rows), never as per-pair payloads; each cluster's O(|cluster|²)
    # cosines are one chunked numpy broadcast (the product tensor is kept
    # ~64 MB regardless of cluster size). np.cumsum accumulates
    # LEFT-TO-RIGHT like the zip_with/aggregate fold this replaced, so
    # the cosine doubles, the >= tau decisions, and the drop rule
    # (keep-low-centroid-similarity, tie -> drop higher id) are
    # bit-identical to the expression form.
    def _cluster_drops(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"__id": pd.array([], dtype="int64")})
        ids = pdf["__id"].to_numpy(np.int64)
        cc = pdf["cent_cos"].to_numpy(np.float64)
        u = np.array(pdf["__u"].tolist(), dtype=np.float64)
        d_ = u.shape[1]
        step = max(1, (64 << 20) // (8 * n * d_))
        out = []
        for lo in range(0, n, step):
            hi = lo + step
            cos = np.cumsum(u[lo:hi, None, :] * u[None, :, :], axis=2)[:, :, -1]
            m = (cos >= tau) & (ids[lo:hi, None] < ids[None, :])
            if not m.any():
                continue
            i, j = np.nonzero(m)
            il, ir = ids[lo:hi][i], ids[j]
            ccl, ccr = cc[lo:hi][i], cc[j]
            out.append(
                np.where(
                    ccl > ccr, il, np.where(ccr > ccl, ir, np.maximum(il, ir))
                )
            )
        if not out:
            return pd.DataFrame({"__id": pd.array([], dtype="int64")})
        return pd.DataFrame({"__id": np.unique(np.concatenate(out))})

    drops = (
        scored.select("__id", "list_id", "cent_cos", "__u")
        .groupBy("list_id")
        .applyInPandas(_cluster_drops, "__id BIGINT")
    ).distinct()
    # merge hint: drops comes out of a pandas group scan (no stats) and
    # can approach corpus size at high duplication — never broadcast it
    return (
        scored.join(
            drops.withColumn("__dropped", F.lit(True)).hint("merge"),
            "__id",
            "left",
        )
        .select(
            F.col("__id").alias(id_col),
            "list_id",
            "cent_cos",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("keep"),
        )
    )


def ivf_build(
    corpus: DataFrame,
    centroids: np.ndarray,
    index_path: str,
    emb_col: str = "embedding",
) -> None:
    """Materialize the IVF index: corpus written as parquet PARTITIONED BY
    list_id. Queries then touch only their probe lists' directories —
    partition pruning turns nprobe/nlist into a physical I/O reduction,
    which is the entire point of IVF at 100 TB (reading 2/16ths of the
    corpus instead of all of it, before any compute)."""
    assigned = ivf_assign(corpus, centroids, emb_col)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(index_path)


def ivf_append(
    new_vectors: DataFrame,
    centroids: np.ndarray,
    index_path: str,
    emb_col: str = "embedding",
) -> None:
    """Zero-rewrite IVF index MAINTENANCE (the ANN analog of the dedup
    family's ``minhash_index_append``): the day's new vectors are
    assigned to their nearest FIXED centroids and appended as new
    parquet files inside the existing ``list_id`` partition directories
    — O(batch) written, nothing rewritten, and every existing reader
    (``ivf_topk_indexed``, ``ivfpq_topk_indexed`` stage 3) sees the
    union on its next scan because partition pruning is directory-based.
    Centroids stay fixed between re-clusterings (standard IVF practice —
    re-fitting them is the compaction-shaped rebuild, ``ivf_build``);
    list sizes drift as the corpus distribution does, which bounds probe
    quality, not correctness."""
    assigned = ivf_assign(new_vectors, centroids, emb_col)
    assigned.write.mode("append").partitionBy("list_id").parquet(index_path)


def _probe_lists(qa: DataFrame, centroids: np.ndarray, nprobe: int) -> DataFrame:
    """(query_id, __qe, list_id) — each query exploded to its ``nprobe``
    nearest centroid lists, computed JVM-side (centroids ride as literal
    arrays — fine at typical nlist <= a few hundred; beyond that,
    broadcast a centroid DataFrame instead).  Ties on distance break by
    list_id via the lexicographic struct sort, matching the oracles'
    ORDER BY (distance, list_id)."""
    probes = []
    for ci, cent in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(F.col("__qe"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        probes.append(F.struct(d.alias("d"), F.lit(ci).alias("list_id")))
    return (
        qa.withColumn(
            "__probe", F.slice(F.array_sort(F.array(*probes)), 1, nprobe)
        )
        .select(
            "query_id", "__qe",
            F.explode_outer("__probe.list_id").alias("list_id"),
        )
        .filter(F.col("list_id").isNotNull())
    )


def ivf_topk(
    corpus_assigned: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: each query scans only its ``nprobe`` nearest
    centroid lists. ``corpus_assigned`` must carry ``list_id`` (from
    ``ivf_assign``; persist/partition by it for reuse across query batches).
    """
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    # per-side norm staging (round 12) — see cosine_topk; the query norm
    # is staged after the probe explode (once per (query, probe) row,
    # nprobe << list size), the corpus norm once per corpus row
    qp = _probe_lists(qa, centroids, nprobe).withColumn("__qn", _norm("__qe"))
    c = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("__ce"),
        "list_id",
    ).withColumn("__cn", _norm("__ce"))
    scored = (
        c.join(F.broadcast(qp), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine_staged("__ce", "__qe", "__cn", "__qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # + 0.0 folds -0.0 to +0.0 (CLAUDE.md rule 8): an
            # unthresholded cosine can round to -0.0 on one engine only
            (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"),
            "rank",
        )
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """``ivf_topk`` over a MATERIALIZED ``ivf_build`` index with the
    probe set applied as a STATIC partition filter — the physical half
    of the IVF promise: the query batch's union of probe lists (a
    model-sized set — at most nprobe x |queries| ints, <= nlist after
    dedup) is collected driver-side and pushed into the scan as
    ``list_id IN (...)``, so only the probed directories are READ.
    At 100 TB this is the difference between scanning the whole corpus
    and scanning nprobe/nlist of it BEFORE any compute — partition
    pruning, not a post-scan filter (plan lock:
    tests/test_plan_regressions.py::test_x104_ivf_scan_partition_pruned
    asserts PartitionFilters on the index scan).  Per-query probe
    restriction (a query only scores ITS OWN probe lists, not the
    batch union) still applies inside via the broadcast probe join —
    results are identical to ``ivf_topk`` over the full assigned
    corpus.  The query batch is MATERIALIZED once (localCheckpoint —
    batch-sized, the same frame the probe job consumes) and reused for
    both probe selection and scoring, so a nondeterministic ``queries``
    frame (sample / rand / unordered limit) cannot re-select probe
    lists that were pruned out of the scan."""
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    ).localCheckpoint()
    ids = sorted(
        r["list_id"]
        for r in _probe_lists(qa, centroids, nprobe)
        .select("list_id")
        .distinct()
        .collect()
    )
    corpus = spark.read.parquet(index_path).filter(
        F.col("list_id").isin([int(i) for i in ids])
    )
    # hand the SAME materialized batch to ivf_topk (renamed back to the
    # caller's column names — emb_col also names the corpus column there)
    return ivf_topk(
        corpus,
        qa.select(
            F.col("query_id").alias(query_id_col),
            F.col("__qe").alias(emb_col),
        ),
        centroids,
        k,
        nprobe,
        emb_col=emb_col,
        id_col=id_col,
        query_id_col=query_id_col,
    )


def ivfpq_topk(
    corpus_assigned: DataFrame,
    codes: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 40,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The full production ANN stack — IVF probe → PQ/ADC shortlist →
    exact re-rank (the FAISS ``IVFPQ + refine`` layout), composed from
    the engine's pieces so each stage keeps its proven scale shape:

    1. **IVF probe**: each query selects its ``nprobe`` nearest
       centroid lists (JVM literal-centroid folds, the ``ivf_topk``
       expression) — bounds WHICH codes are scanned to
       ~nprobe/nlist of the corpus.
    2. **ADC shortlist**: per-query LUT (broadcast, |q|·m·k rows)
       joined against the PROBED lists' PQ codes only; approximate
       distances rank a ``shortlist`` of candidates per query. Codes
       are 32×-compressed and never shuffle for scoring.
    3. **Exact re-rank**: only the shortlist ids fetch their
       full-precision embeddings (skinny candidate join — the
       payload-per-verified-candidate shape of the dedup family);
       exact cosine orders the final top-k.

    At 100 TB: stage 1 prunes the scan, stage 2 touches 1/32nd of the
    pruned bytes, stage 3 touches ``|q| × shortlist`` full vectors —
    the only full-precision I/O in the whole query.
    """
    m, kk, dsub = codebooks.shape
    spark = codes.sparkSession
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    probes = []
    for ci, cent in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(F.col("__qe"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        probes.append(F.struct(d.alias("d"), F.lit(ci).alias("list_id")))
    qp = (
        qa.withColumn(
            "__probe", F.slice(F.array_sort(F.array(*probes)), 1, nprobe)
        )
        .select("query_id", F.explode_outer("__probe.list_id").alias("list_id"))
        .filter(F.col("list_id").isNotNull())
    )

    cb_rows = [
        (int(s), int(c), [float(v) for v in codebooks[s, c]])
        for s in range(m)
        for c in range(kk)
    ]
    cb = spark.createDataFrame(cb_rows, ["sub", "code", "__w"])
    qsub = F.slice(F.col("__qe"), F.col("sub") * dsub + 1, dsub)
    luts = (
        qa.crossJoin(F.broadcast(cb))
        .withColumn("__qs", qsub)
        .select(
            "query_id",
            "sub",
            "code",
            F.aggregate(
                F.zip_with(
                    F.col("__qs"), F.col("__w"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("__d2"),
        )
    )

    lists = corpus_assigned.select(F.col(id_col).alias("__vid"), "list_id")
    pruned_codes = codes.join(
        lists.withColumnRenamed("__vid", "vec_id"), "vec_id"
    ).join(F.broadcast(qp), "list_id")
    adists = (
        pruned_codes.join(F.broadcast(luts), ["query_id", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("__d2").alias("adist"))
    )
    # rank on the 6dp-rounded distance: the raw sum's last-bit jitter is
    # accumulation-order-dependent (Spark partial aggs vs the oracle's
    # SQL), and an unrounded ORDER BY would make shortlist membership at
    # the boundary engine-dependent for mathematically tied candidates;
    # rounding collapses the jitter and ties break by id on both sides
    ws = Window.partitionBy("query_id").orderBy(
        F.round(F.col("adist"), 6), F.col("neighbor_id")
    )
    short = (
        adists.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= shortlist)
        .select("query_id", "neighbor_id", "adist")
    )

    full = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("__ce"),
    )
    reranked = (
        short.join(full, "neighbor_id")
        .join(F.broadcast(qa), "query_id")
        .withColumn("cosine", cosine(F.col("__ce"), F.col("__qe")))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def pq_codes_write(
    codes: DataFrame,
    corpus_assigned: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Materialize PQ codes as parquet PARTITIONED BY list_id — the
    compressed half of the on-disk FAISS-style IVFPQ layout
    (``ivf_build`` materializes the full-precision half).  Each vector's
    (sub, code) rows land in its IVF list's directory, so a query
    batch's probe union prunes the CODES scan at the I/O layer exactly
    like the embedding scan: ADC scoring reads nprobe/nlist of the
    32x-compressed bytes, before any compute."""
    lists = corpus_assigned.select(F.col(id_col).alias(id_col), "list_id")
    (
        codes.join(lists, id_col)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    codes_path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 40,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """``ivfpq_topk`` served END TO END from materialized index
    artifacts (round-10 VERDICT item 5): stage 1's probe union is
    collected driver-side (model-sized) and pushed as a STATIC
    ``list_id IN (...)`` partition filter into BOTH the PQ-codes scan
    (``pq_codes_write`` artifact — the ADC stage reads only the probed
    directories' compressed bytes) and the full-precision scan
    (``ivf_build`` artifact — only probed lists can appear in a
    shortlist, so the exact re-rank fetch prunes identically).
    Results are identical to ``ivfpq_topk`` over the full in-memory
    frames: per-query probe restriction still applies inside via the
    broadcast probe join, and shortlist membership only ever draws
    from probed lists.  The query batch is materialized once
    (localCheckpoint) so a nondeterministic frame cannot re-select
    pruned lists.  At 100 TB: probe selection is driver math, the ADC
    stage reads nprobe/nlist of 1/32nd of the corpus bytes, and the
    re-rank reads |q| x shortlist full vectors — nothing else is
    touched."""
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    ).localCheckpoint()
    ids = [
        int(r["list_id"])
        for r in _probe_lists(qa, centroids, nprobe)
        .select("list_id")
        .distinct()
        .collect()
    ]
    ids = sorted(ids)
    corpus = spark.read.parquet(index_path).filter(F.col("list_id").isin(ids))
    codes = (
        spark.read.parquet(codes_path)
        .filter(F.col("list_id").isin(ids))
        .select("vec_id", "sub", "code")
    )
    return ivfpq_topk(
        corpus,
        codes,
        centroids,
        codebooks,
        qa.select(
            F.col("query_id").alias(query_id_col),
            F.col("__qe").alias(emb_col),
        ),
        k=k,
        nprobe=nprobe,
        shortlist=shortlist,
        emb_col=emb_col,
        id_col=id_col,
        query_id_col=query_id_col,
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the ``k`` most-cosine-similar corpus vectors carrying a
    DIFFERENT label — the negatives that sit closest to the decision
    boundary and therefore carry the most gradient signal (the standard
    in-batch-negatives upgrade for embedding/reranker training).

    Same scale shape as ``cosine_topk``: the anchor set is an eval/batch
    sample (MBs against a 100 TB corpus) and broadcasts; scoring is a
    map-only pass over the corpus; per-anchor top-k prunes below the
    exchange (WindowGroupLimit). Rows with NULL labels can't be proven
    negative and are excluded on either side; ties rank by neighbor id.
    At full-corpus anchor counts use the IVF/ANN stack to pre-select
    candidates and re-rank exactly, as in x83.
    """
    # per-side norm staging (round 12) — see cosine_topk: one norm fold
    # per row instead of two per (anchor, corpus) pair, bit-identical
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__nl"),
        F.col(emb_col).cast("array<double>").alias("__ce"),
    ).where(F.col("__nl").isNotNull()).withColumn("__cn", _norm("__ce"))
    q = anchors.select(
        F.col(anchor_id_col).alias("anchor_id"),
        F.col(label_col).alias("__al"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    ).where(F.col("__al").isNotNull()).withColumn("__qn", _norm("__qe"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("anchor_id"))
        .filter(F.col("__nl") != F.col("__al"))
        .withColumn("cosine", _cosine_staged("__ce", "__qe", "__cn", "__qn"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "neighbor_id",
            # + 0.0 folds -0.0 to +0.0 (CLAUDE.md rule 8): a negative
            # cosine in (-5e-7, 0] rounds to -0.0 on one engine and
            # +0.0 on the other, and the value hash tells them apart
            (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"),
            "rank",
        )
    )


def embedding_covariance(
    df: DataFrame,
    emb_col: str = "embedding",
    dim: int = 64,
    quant: float = 1e6,
) -> DataFrame:
    """EXACT covariance statistics of an embedding column — the
    PCA/whitening preparation pass (the d×d matrix a driver-side
    eigendecomposition consumes; ZCA whitening, low-rank projection and
    SemDeDup-style preprocessing all start here).

    Determinism (CLAUDE.md rule 3b): embeddings are quantized to integer
    units of ``1/quant`` FIRST, and every aggregated statistic
    (pairwise product sums, per-dimension sums, the row count) is an
    exact int64 sum — layout-invariant where a float covariance
    accumulation would depend on shuffle merge order. The covariance
    itself is then per-row float arithmetic on those exact integers:
    ``cov = ((sxy - sx*sy/n) / n) / quant²`` — population covariance in
    RAW units (the quant² descale also keeps |cov| small enough that
    fixed-decimal rounding is engine-stable; at quantized-unit²
    magnitudes ~1e10 the two engines' round(·, 6) implementations
    diverge in the last ulp). Int64 sums hold to ~1e18, i.e. ~10^6 rows
    of unit-scale 64-dim vectors at quant=1e6 — and the bound is
    ENFORCED, not advisory (round-9 VERDICT item 3): quantized values
    above sqrt(int64 max) raise at quantize time (so no x·y product
    can wrap), and the three sums are ``try_sum``s re-checked with a
    raise — Spark's non-ANSI ``sum(long)`` wraps silently, which on
    exactly the corpus sizes this operator targets would return wrong
    covariances with no error.  Past the bound, lower ``quant`` (the
    statistics stay exact at the coarser grid) or pre-aggregate in
    batches and merge the (n, sx, sy, sxy) monoids.

    Scale shape: one map-only double posexplode fans each row into its
    d(d+1)/2 upper-triangle (i, j, x·y) products (skinny ints), and ONE
    partial-aggregated groupBy(i, j) reduces them — the shuffle carries
    at most d(d+1)/2 keys × partitions rows, never payloads. The sums
    are pure monoids, so per-batch outputs merge by addition (the
    incremental-statistics shape). Rows with NULL or wrong-length
    embeddings are excluded (they have no defined contribution).

    Returns (i, j, n, sx, sy, sxy, cov) for 0 <= i <= j < dim.
    """
    # |q| <= floor(sqrt(2^63 - 1)) keeps every x*y product inside int64;
    # a violating element raises instead of silently wrapping downstream
    qlim = 3_037_000_499
    q = (
        df.select(F.col(emb_col).cast("array<double>").alias("__e"))
        .where(F.col("__e").isNotNull() & (F.size("__e") == dim))
        .select(
            F.transform(
                F.col("__e"),
                # NULL elements must stay NULL (rule 3: NULL is the
                # missingness marker) — the downstream posexplode
                # isNotNull filters exclude them pairwise. Without the
                # leading isNull branch the <= comparison is NULL,
                # which F.when treats as false and the guard raises.
                lambda v: F.when(v.isNull(), F.lit(None).cast("long"))
                .when(
                    F.isnan(v),
                    F.raise_error(
                        F.lit(
                            "embedding_covariance: NaN element; use NULL "
                            "for missing values"
                        )
                    ).cast("long"),
                )
                .when(
                    F.abs(F.round(v * quant)) <= qlim,
                    F.round(v * quant).cast("long"),
                )
                .otherwise(
                    F.raise_error(
                        F.lit(
                            "embedding_covariance: quantized value exceeds "
                            "sqrt(int64 max); lower quant"
                        )
                    ).cast("long")
                ),
            ).alias("__q")
        )
    )
    xi = q.select(
        "__q", F.posexplode_outer("__q").alias("i", "__x")
    ).where(F.col("__x").isNotNull())
    pairs = (
        xi.select(
            "i",
            "__x",
            F.posexplode_outer("__q").alias("j", "__y"),
        )
        .where(F.col("__y").isNotNull() & (F.col("j") >= F.col("i")))
        .select("i", "j", "__x", "__y")
    )
    def _checked(c: Column) -> Column:
        # try_sum yields NULL on int64 overflow where sum() wraps
        # silently; every input row is non-NULL, so a NULL here IS the
        # overflow — surface it instead of returning wrapped statistics
        return F.when(c.isNotNull(), c).otherwise(
            F.raise_error(
                F.lit(
                    "embedding_covariance: int64 sum overflow; lower "
                    "quant or merge per-batch grids"
                )
            ).cast("long")
        )

    sums = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        _checked(F.try_sum("__x")).alias("sx"),
        _checked(F.try_sum("__y")).alias("sy"),
        _checked(F.try_sum(F.col("__x") * F.col("__y"))).alias("sxy"),
    )
    cov = (
        (
            F.col("sxy").cast("double")
            - F.col("sx").cast("double")
            * F.col("sy").cast("double")
            / F.col("n").cast("double")
        )
        / F.col("n").cast("double")
    ) / F.lit(float(quant) * float(quant))
    return sums.select("i", "j", "n", "sx", "sy", "sxy", cov.alias("cov"))


def covariance_merge(*grids: DataFrame, quant: float = 1e6) -> DataFrame:
    """Merge per-batch ``embedding_covariance`` grids by ADDITION — the
    monoid path the covariance docstring promises past the int64 bound
    ("pre-aggregate in batches and merge the (n, sx, sy, sxy) grids")
    and the incremental-statistics shape for daily corpora: each batch
    contributes exact integer sums per upper-triangle (i, j); the union
    re-sums them (still exact int64 — overflow is re-checked with the
    same try_sum raise) and recomputes the covariance with the IDENTICAL
    float op sequence, so merging k batches is bit-identical to one
    pass over their union.  Skinny all the way: k × d(d+1)/2 rows in,
    d(d+1)/2 out."""
    if not grids:
        raise ValueError("covariance_merge: pass at least one grid")
    u = grids[0].select("i", "j", "n", "sx", "sy", "sxy")
    for g in grids[1:]:
        u = u.unionByName(g.select("i", "j", "n", "sx", "sy", "sxy"))

    def _checked(c: Column) -> Column:
        return F.when(c.isNotNull(), c).otherwise(
            F.raise_error(
                F.lit(
                    "covariance_merge: int64 sum overflow; lower quant "
                    "or merge fewer batches per level"
                )
            ).cast("long")
        )

    sums = u.groupBy("i", "j").agg(
        _checked(F.try_sum("n")).alias("n"),
        _checked(F.try_sum("sx")).alias("sx"),
        _checked(F.try_sum("sy")).alias("sy"),
        _checked(F.try_sum("sxy")).alias("sxy"),
    )
    cov = (
        (
            F.col("sxy").cast("double")
            - F.col("sx").cast("double")
            * F.col("sy").cast("double")
            / F.col("n").cast("double")
        )
        / F.col("n").cast("double")
    ) / F.lit(float(quant) * float(quant))
    return sums.select("i", "j", "n", "sx", "sy", "sxy", cov.alias("cov"))


def pca_basis(
    cov_df: DataFrame,
    dim: int = 64,
    k: int = 8,
    whiten: bool = False,
    quant: float = 1e6,
) -> tuple[np.ndarray, list[float], list[float]]:
    """Driver-side eigendecomposition of an ``embedding_covariance``
    grid — the APPLY half's model fit (round-9 VERDICT item 3: x100
    produces the covariance; this consumes it).  Collects the
    d(d+1)/2-row grid (the "<=MB final grid" collect rule — 2,080 rows
    at d=64), assembles the symmetric covariance matrix, and returns
    the top-``k`` principal axes ready for ``pca_project``:

        (wq, offsets, eigvals)

    * ``wq``       — k x d int64: eigenvectors ordered by DESCENDING
      eigenvalue, sign-normalized (the largest-|coefficient| entry is
      made positive — eigenvector sign is otherwise arbitrary),
      optionally whitened (scaled by 1/sqrt(eigval) so projected
      components have unit variance), then quantized to integer units
      of ``1/quant``.  Quantizing the MODEL (not just the data) keeps
      the projection exact-integer end to end (CLAUDE.md rule 3b) and
      absorbs sub-1e-9 eigensolver jitter, so independently-computed
      bases agree bit-for-bit.
    * ``offsets``  — per-component mean offset ``sum_j wq[c,j] *
      sx[j] / (n * quant^2)``: projecting CENTERED data is
      ``A/quant^2 - offset`` with ``A`` the raw integer dot product —
      the numerator is exact (arbitrary-precision) integer arithmetic,
      one float division at the end.
    * ``eigvals``  — the k eigenvalues (raw units), for variance
      reporting / component selection.

    Raises when whitening a degenerate direction (eigenvalue <= 1e-9 of
    the spectrum's maximum — the 1/sqrt scale is numerically undefined
    there; with n > d real data the top-k eigenvalues are comfortably
    positive, and a rank-deficient corpus should reduce k instead).
    """
    rows = cov_df.collect()
    n = None
    m = np.zeros((dim, dim), dtype=np.float64)
    sx = [0] * dim
    for r in rows:
        i, j = r["i"], r["j"]
        m[i, j] = m[j, i] = r["cov"]
        if i == j:
            sx[i] = int(r["sx"])
        if n is None:
            n = int(r["n"])
    if n is None:
        raise ValueError("empty covariance grid")
    evals, evecs = np.linalg.eigh(m)          # ascending
    order = np.arange(dim - 1, dim - 1 - k, -1)  # top-k, descending
    wq = np.zeros((k, dim), dtype=np.int64)
    offsets: list[float] = []
    eigvals: list[float] = []
    for c, idx in enumerate(order):
        lam = float(evals[idx])
        v = evecs[:, idx].copy()
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        if whiten:
            if lam <= 1e-9 * max(abs(float(evals[0])), abs(float(evals[-1]))):
                raise ValueError(
                    f"whiten=True but eigenvalue {c} is degenerate ({lam});"
                    " reduce k to the corpus rank"
                )
            v = v / math.sqrt(lam)
        wq[c] = np.round(v * quant).astype(np.int64)
        b = sum(int(wq[c, j]) * sx[j] for j in range(dim))  # exact int
        offsets.append(b / (n * quant * quant))
        eigvals.append(lam)
    return wq, offsets, eigvals


def pca_project(
    df: DataFrame,
    wq: np.ndarray,
    offsets: list[float],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    quant: float = 1e6,
    max_literal_terms: int = 4096,
) -> DataFrame:
    """MAP-ONLY quantized PCA projection/whitening — applies a
    ``pca_basis`` model to the corpus: one row per input vector with
    ``proj`` = ARRAY<DOUBLE> of k centered (optionally whitened)
    components.

    Exactness: the embedding is quantized to integers exactly as
    ``embedding_covariance`` quantizes it, the per-component dot
    product ``A_c = sum_j q[j] * wq[c,j]`` is an exact int64 sum of
    literal multiply-adds, and the float arithmetic is one division
    and one subtraction per component (``A/quant^2 - offset``) —
    deterministic on any layout because nothing is reduced across
    rows.  Bounds: |q| <= quant * |v|max and |wq| <= quant * |w|max,
    so A stays far inside int64 for unit-scale embeddings at the
    default quant (~1e13 * d).

    Scale shape: the k x d weight matrix enters the plan as LITERALS
    (k*d multiply-add terms inside whole-stage codegen) — no
    broadcast, no shuffle, no Python; the plan is scan -> project
    (plan-locked).  Rows with NULL/wrong-length embeddings are
    excluded, and so are rows carrying a NULL *element* inside a
    correct-length embedding — every projected component touches every
    dimension, so such a row has no defined projection (the covariance
    pass excludes those elements pairwise; a row it contributed to
    partially still cannot be projected).

    LITERAL-SIZE CLIFF (round-10 VERDICT "What's wrong" #2): the
    literal expansion is ideal at small k*d (64x8) but k*d multiply-add
    terms as plan literals stress codegen/analysis at production
    embedding shapes (d=1024, k=256 is 262k terms).  When ``k * dim >
    max_literal_terms`` (default 4096) the projection switches to an
    Arrow-batched ``mapInPandas`` with the int64 weight matrix carried
    in the closure: the SAME exact-integer dot product (numpy int64
    matmul on the SAME Spark-side quantized integers — rounding never
    re-derives in Python) and the same two float ops per component, so
    the two paths are BIT-IDENTICAL (parity-tested).  Still map-only:
    no shuffle, one Arrow crossing.
    """
    k, dim = wq.shape
    staged = (
        df.select(
            F.col(id_col).alias(id_col),
            F.col(emb_col).cast("array<double>").alias("__e"),
        )
        .where(
            F.col("__e").isNotNull()
            & (F.size("__e") == dim)
            & ~F.exists(F.col("__e"), lambda v: v.isNull())
        )
        .select(
            id_col,
            F.transform(
                F.col("__e"), lambda v: F.round(v * quant).cast("long")
            ).alias("__q"),
        )
    )
    qq = float(quant) * float(quant)
    if k * dim > int(max_literal_terms):
        # large-k*d fallback: closure-carried int64 matmul in Arrow
        # batches — the quantized integers STILL come from the Spark
        # expression above (identical rounding), numpy only multiplies
        # and sums exact int64, then the same descale + offset floats
        import pandas as pd

        w_t = np.ascontiguousarray(wq.astype(np.int64).T)  # d x k
        offs = np.asarray([float(o) for o in offsets], dtype=np.float64)
        out_schema = f"{id_col} {staged.schema[id_col].dataType.simpleString()}, proj array<double>"

        def _proj(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q = np.asarray(
                    [np.asarray(a, dtype=np.int64) for a in pdf["__q"]],
                    dtype=np.int64,
                )
                a = q @ w_t                     # exact int64, n x k
                proj = a.astype(np.float64) / qq - offs
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "proj": list(map(list, proj))}
                )

        return staged.mapInPandas(_proj, out_schema)
    # Each component's multiply-add chain is built as ONE SQL string and
    # parsed once (round 12): the previous per-term Column algebra made
    # ~4 py4j round-trips per literal — 5-8 s of pure DRIVER time at
    # k*d = 512 (measured; Spark execution of the same plan is <1 s).
    # `{w}L` BIGINT literals × the BIGINT array element reproduce the
    # exact int64 multiply-add tree term for term, in the same j-ascending
    # order, so the result is bit-identical to the Column form.
    comps = []
    for c in range(k):
        terms = [
            f"__q[{j}] * {int(wq[c, j])}L"
            for j in range(dim)
            if int(wq[c, j]) != 0
        ]
        acc = F.expr(" + ".join(terms)) if terms else F.lit(0).cast("long")
        comps.append(
            (acc.cast("double") / F.lit(qq)) - F.lit(float(offsets[c]))
        )
    return staged.select(id_col, F.array(*comps).alias("proj"))
