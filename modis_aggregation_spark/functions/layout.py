"""Z-order (Morton) layout keys for data-skipping file layout.

At 100 TB, multi-dimensional pruning lives or dies on physical layout:
parquet min/max footer stats only skip files when rows with nearby values
in BOTH filter dimensions land in the same files. A lexicographic sort
clusters only the leading column; the Morton key interleaves the bits of
two quantized dimensions so a range predicate on EITHER column touches
O(√files) instead of all of them — the same layout trick Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY``.

All bit-twiddling is plain int64 shift/mask arithmetic (the classic
magic-mask spread), so the key is computable identically by any engine —
fully value-checkable by the DuckDB oracle, and entirely inside Spark
whole-stage codegen (no UDF).

No counterpart in the reference (its layout is file-per-granule,
``MODIS_Aggregation/aggregate_functions.py:96-109``); this serves the
engine's lake-maintenance surface alongside ``operators/merge.py``
``compact_parquet``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic masks that spread a 16-bit value's bits to even positions of a
# 32-bit lane: 0b...0101. Stage masks for the (8,4,2,1) shift cascade.
_SPREAD_STAGES: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` to the even bit positions of a
    32-bit value (0babcd → 0b0a0b0c0d)."""
    out = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STAGES:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton interleave of two 16-bit quantized coordinates:
    ``y``'s bits land on odd positions, ``x``'s on even."""
    return F.shiftleft(spread_bits16(y), 1).bitwiseOR(spread_bits16(x)).cast("long")


def quantize16(v: Column, vmin: Column, vmax: Column) -> Column:
    """Scale ``v`` from [vmin, vmax] onto the 16-bit grid 0..65535
    (NULL-safe; degenerate vmin==vmax ranges map to 0)."""
    span = F.nullif(vmax - vmin, F.lit(0.0))
    q = F.floor((v - vmin) / span * 65535.0)
    # explicit NULL branch: Spark's least/greatest SKIP nulls (a NULL q
    # would otherwise silently clamp to 65535, not 0)
    return F.when(
        v.isNull() | span.isNull(), F.lit(0)
    ).otherwise(F.greatest(F.lit(0), F.least(q, F.lit(65535)))).cast("long")


def zorder_key(
    df: DataFrame, xcol: str, ycol: str, key_name: str = "zkey"
) -> DataFrame:
    """Append a Morton key over min/max-quantized ``xcol``/``ycol``.

    The per-column min/max is one partial+final aggregate producing a
    single row, broadcast back via crossJoin — the same scalar-broadcast
    shape every normalizing operator in this repo uses. The key itself is
    a pure projection (narrow, codegen'd).
    """
    bounds = df.agg(
        F.min(F.col(xcol).cast("double")).alias("__xmin"),
        F.max(F.col(xcol).cast("double")).alias("__xmax"),
        F.min(F.col(ycol).cast("double")).alias("__ymin"),
        F.max(F.col(ycol).cast("double")).alias("__ymax"),
    )
    staged = df.crossJoin(F.broadcast(bounds))
    zk = morton_key(
        quantize16(F.col(xcol).cast("double"), F.col("__xmin"), F.col("__xmax")),
        quantize16(F.col(ycol).cast("double"), F.col("__ymin"), F.col("__ymax")),
    )
    return staged.withColumn(key_name, zk).drop("__xmin", "__xmax", "__ymin", "__ymax")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 200,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Morton key of ``cols`` (exactly two columns).

    ``repartitionByRange`` samples the key distribution so files hold
    equal-count Morton ranges (skew-proof even when the quantized space is
    sparsely populated); ``sortWithinPartitions`` orders rows inside each
    file so parquet page-level stats prune too, not just file footers.
    """
    if len(cols) != 2:
        raise ValueError(f"zorder_write takes exactly 2 columns, got {list(cols)!r}")
    keyed = zorder_key(df, cols[0], cols[1])
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode(mode)
        .parquet(path)
    )


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a CPU-bound stage's input up to cluster
    parallelism when the scan yields fewer partitions than cores.

    Small-file corpora (one parquet file = one input split) would
    otherwise serialize a whole Python/Arrow decode or hash pass onto
    ONE core — measured 6-19x wall-clock on the sf0.1 media/minhash
    queries. At real corpus scale the scan already carries thousands of
    splits and this is a no-op: no shuffle is added. Call it on the
    SKINNY projection feeding the expensive stage (id + payload), never
    on the wide scan.

    Only physical layout changes — row content is untouched, so keyed
    joins/aggregations downstream are semantics-identical. Do NOT use
    under partition-layout-sensitive expressions
    (``monotonically_increasing_id``, ``input_file_name``,
    ``spark_partition_id``). Streaming frames are returned unchanged
    (micro-batch inputs repartition explicitly where profitable — the
    s20 pattern — because ``.rdd`` is undefined for them).
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
