"""End-to-end L2→L3 aggregation plan builder.

This is the engine's equivalent of the reference's whole execution path —
``read_user_inputs`` → ``run_modis_aggre`` → finalize → write (reference
``MODIS_Aggregation/aggregate_functions.py:282-410,455-717``) — expressed as
ONE declarative DataFrame plan:

    catalog (broadcast) ⋈ pixels
      → day-definition nulling (P4)
      → bbox/sampling filter + cell id (P2, S9, A1)
      → single groupBy(cell).agg(
            per-variable min/max/sum/count/mean/std/sumsq,   A3-A8
            cloudy/total pixel counts + CF ratio,            A11-A12
            per-variable ARRAY histograms,                   A9
            joint ARRAY histograms,                          A10
            granule count,                                   A14
        )
      ⟕ two-level per-granule CF extremes (A13)
      → densify to the full grid (J3)

Scale notes: exactly two shuffles — the main hash aggregation (≤ ncells
groups; partial aggregation makes shuffle volume O(partitions × cells),
independent of pixel count) and the (cell, granule) pre-aggregation for CF
extremes (≤ cells × granules-per-cell groups). The catalog join is
broadcast; densification joins a generated dimension against the tiny
aggregate. Everything else is narrow and whole-stage-codegen'd; the scan
dominates and scales embarrassingly with granule count, which is the same
property the reference's file-level MPI/Dask partitioning exploits
(``MODIS_Aggregation_MPI.py:52-63``).

``strict_compat=True`` reproduces reference quirks where feasible:
* Q1 — the CF 1-D histogram stays all-zero (the reference never adds to it,
  ``aggregate_functions.py:259-263``); correct mode bins the per-granule
  fraction.
* Q2 — CF std is ``sqrt(ΣCLD² / ΣTOT − mean²)`` over per-granule pixel
  counts (``:251-252,711``); correct mode is the population std of
  per-granule fractions.
* Q5 — GRID_Counts counts (granule, variable-with-valid-data) pairs plus
  the CF call (``:245-247``); correct mode is count(DISTINCT granule_id).
(Q6's sampling-offset mismatch is intentionally NOT reproduced — it would
pair measures with another column's geolocation; the engine documents the
single consistent offset. SURVEY §2.8.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modis_aggregation_spark.config import AggregationSpec
from modis_aggregation_spark.functions.dayrules import day_definition_condition
from modis_aggregation_spark.functions.histogram import hist_bucket
from modis_aggregation_spark.operators.densify import densify
from modis_aggregation_spark.operators.stats import with_cell, with_cloud_mask


def prepare_pixels(
    pixels: DataFrame,
    granules: DataFrame,
    spec: AggregationSpec,
    end_doy: int | None = None,
    spill_doy: int | None = None,
) -> DataFrame:
    """Decode + filter + cell-id stage shared by batch and streaming plans.

    ``granules`` must carry (granule_id, doy, hour); it is broadcast —
    granule catalogs are ~100k rows/year, trivially broadcastable even at
    full-mission scale.
    """
    from modis_aggregation_spark.operators.stats import validate_resolution

    measure_cols = [v.name for v in spec.physical_variables()]
    validate_resolution(pixels, measure_cols)  # S11: fail before the job
    cat = granules.select("granule_id", "doy", "hour")
    df = pixels.join(F.broadcast(cat), "granule_id")
    df = with_cloud_mask(df)
    if end_doy is not None and spill_doy is not None:
        cond = day_definition_condition(
            F.col("lon"), F.col("doy"), F.col("hour"),
            end_doy, spill_doy, spec.shift_hours,
        )
        # measures AND the decoded cloud mask are nulled (the reference
        # nulls CM for the cloud-fraction path, aggregate_functions.py:340-350)
        df = df.withColumns(
            {c: F.when(cond, F.lit(None)).otherwise(F.col(c))
             for c in measure_cols + ["cm"]}
        )
    return with_cell(df, spec)


def _stat_exprs_for(spec: AggregationSpec) -> list:
    """Aggregate expressions for the single main pass."""
    exprs: list = []
    cm = F.col("cm")
    cld = F.when(cm.between(0, 1), 1).otherwise(0)
    tot = F.when(cm.between(0, 3), 1).otherwise(0)

    for v in spec.physical_variables():
        c = F.col(v.name)
        n = v.name
        if "Minimum" in spec.stats:
            exprs.append(F.min(c).alias(f"{n}_min"))
        if "Maximum" in spec.stats:
            exprs.append(F.max(c).alias(f"{n}_max"))
        # sum/count/sumsq are the mergeable partials; mean/std finalized here
        exprs.append(F.sum(c).alias(f"{n}_sum"))
        exprs.append(F.count(c).alias(f"{n}_count"))
        if "Standard_Deviation" in spec.stats:
            exprs.append(F.sum(c * c).alias(f"{n}_sumsq"))
            exprs.append(F.stddev_pop(c).alias(f"{n}_stddev"))
        if "Mean" in spec.stats:
            exprs.append(F.avg(c).alias(f"{n}_mean"))
        if "Histogram_Counts" in spec.stats and v.bin_edges:
            nbins = len(v.bin_edges) - 1
            b = hist_bucket(c, v.bin_edges)
            exprs.append(
                F.array(
                    *[F.sum(F.when(b == i, 1).otherwise(0)).cast("long")
                      for i in range(nbins)]
                ).alias(f"{n}_hist")
            )

    if "Jhisto" in spec.stats:
        for jh in spec.joint_hists:
            xv = spec.variable(jh.varname)
            bx = hist_bucket(F.col(jh.varname), xv.bin_edges)
            by = hist_bucket(F.col(jh.partner_var), jh.joint_edges)
            nbx, nby = len(xv.bin_edges) - 1, len(jh.joint_edges) - 1
            exprs.append(
                F.array(
                    *[
                        F.array(
                            *[
                                F.sum(
                                    F.when((bx == x) & (by == y), 1).otherwise(0)
                                ).cast("long")
                                for y in range(nby)
                            ]
                        )
                        for x in range(nbx)
                    ]
                ).alias(f"{jh.joint_name}_jhist")
            )

    # cloud-fraction pixel counts (A11) + ratio-of-sums mean (A12)
    exprs.append(F.sum(cld).cast("long").alias("cld_pix"))
    exprs.append(F.sum(tot).cast("long").alias("tot_pix"))
    exprs.append(
        (F.sum(cld) / F.nullif(F.sum(tot), F.lit(0))).alias("cf_mean")
    )
    return exprs


def _cf_granule_level(
    px: DataFrame, spec: AggregationSpec, extra_group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Two-level CF stats (A13) + compat Q1/Q2/Q5 variants.

    One (cell, granule) pre-aggregation feeds every per-granule statistic:
    CF extremes, the correct-mode CF histogram/std, the compat-mode
    ΣCLD²-based std and inflated GRID_Counts.
    """
    cm = F.col("cm")
    cld = F.when(cm.between(0, 1), 1).otherwise(0)
    tot = F.when(cm.between(0, 3), 1).otherwise(0)
    var_valid = [
        F.max(F.when(F.col(v.name).isNotNull(), 1).otherwise(0)).alias(f"__v_{v.name}")
        for v in spec.physical_variables()
    ]
    per_granule = px.groupBy("cell", *extra_group_cols, "granule_id").agg(
        F.sum(cld).alias("g_cld"),
        F.sum(tot).alias("g_tot"),
        *var_valid,
    ).withColumn("granule_cf", F.col("g_cld") / F.nullif(F.col("g_tot"), F.lit(0)))

    cf_var = next((v for v in spec.variables if v.is_virtual), None)
    aggs = [
        F.min("granule_cf").alias("cf_min"),
        F.max("granule_cf").alias("cf_max"),
        F.countDistinct("granule_id").alias("grid_count"),
    ]
    if spec.strict_compat:
        # Q2: staged ΣCLD, ΣTOT, ΣCLD² → serial-driver CF "std"
        # guard on ΣTOT>0: greatest() skips NULLs, which would otherwise
        # turn an all-undetermined cell's NULL std into 0.0 (the reference
        # leaves it NaN — found by the hypothesis differential harness)
        mean = F.sum("g_cld") / F.nullif(F.sum("g_tot"), F.lit(0))
        var = F.sum(F.col("g_cld") * F.col("g_cld")) / F.nullif(F.sum("g_tot"), F.lit(0)) - mean * mean
        aggs.append(
            F.when(
                F.sum("g_tot") > 0, F.sqrt(F.greatest(var, F.lit(0.0)))
            ).alias("cf_std")
        )
        # Q5: +1 per (granule, variable-with-valid-data) + the CF call
        inflated = sum(
            (F.col(f"__v_{v.name}") for v in spec.physical_variables()),
            F.when(F.col("granule_cf").isNotNull(), 1).otherwise(0),
        )
        aggs.append(F.sum(inflated).cast("long").alias("grid_count_compat"))
    else:
        aggs.append(F.stddev_pop("granule_cf").alias("cf_std"))
        # mergeable partials of the per-granule CF so reaggregate() can
        # re-finalize cf_granule_mean/cf_granule_stddev across periods
        # (cf_std itself is not mergeable; monthly std comes from these)
        aggs.append(F.sum("granule_cf").alias("cf_granule_sum"))
        aggs.append(F.count("granule_cf").alias("cf_granule_count"))
        aggs.append(
            F.sum(F.col("granule_cf") * F.col("granule_cf")).alias("cf_granule_sumsq")
        )
        if cf_var is not None and cf_var.bin_edges and "Histogram_Counts" in spec.stats:
            nbins = len(cf_var.bin_edges) - 1
            b = hist_bucket(F.col("granule_cf"), cf_var.bin_edges)
            aggs.append(
                F.array(
                    *[F.sum(F.when(b == i, 1).otherwise(0)).cast("long")
                      for i in range(nbins)]
                ).alias("cf_hist")
            )
    out = per_granule.groupBy("cell", *extra_group_cols).agg(*aggs)
    if spec.strict_compat and cf_var is not None and cf_var.bin_edges \
            and "Histogram_Counts" in spec.stats:
        # Q1: the reference's CF histogram never accumulates — emit zeros
        nbins = len(cf_var.bin_edges) - 1
        out = out.withColumn(
            "cf_hist", F.array(*[F.lit(0).cast("long") for _ in range(nbins)])
        )
    return out


def daily_grid(
    spark: SparkSession,
    spec: AggregationSpec,
    pixels: DataFrame,
    granules: DataFrame,
    end_doy: int | None = None,
    spill_doy: int | None = None,
    densify_output: bool = True,
    extra_group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The full L3 daily product as one DataFrame.

    Columns: cell, lat_idx, lon_idx, per-variable ``{var}_{stat}``,
    ``{var}_hist`` arrays, ``{joint}_jhist`` nested arrays, cld/tot pixel
    counts, cf_mean/cf_min/cf_max/cf_std, cf_hist, grid_count.

    ``extra_group_cols`` adds period columns (e.g. ``doy`` from the
    broadcast catalog) to every grouping key, producing the staged
    per-period partials ``reaggregate()`` merges — ONE pass over the
    pixels for a whole month instead of a plan branch per day. Requires
    ``densify_output=False`` (densification is a per-cell-grid concept).
    """
    if extra_group_cols and densify_output:
        raise ValueError("extra_group_cols requires densify_output=False")
    px = prepare_pixels(pixels, granules, spec, end_doy, spill_doy)
    keys = ["cell", *extra_group_cols]
    main = px.groupBy(*keys).agg(*_stat_exprs_for(spec))
    cf = _cf_granule_level(px, spec, extra_group_cols)
    agg = main.join(cf, keys, "left")
    if not densify_output:
        return agg
    zero_cols = [c for c in agg.columns if c.endswith(("_count", "_pix"))]
    zero_cols += [
        c
        for c in ("grid_count", "grid_count_compat")
        if c in agg.columns and c not in zero_cols
    ]
    return densify(agg, spec.nlat, spec.nlon, zero_fill_cols=zero_cols)


def reaggregate(staged: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Monthly (or any period) L3 from staged daily partials (A15/A16).

    Input: the UNdensified per-cell daily frame (``densify_output=False``)
    with an extra period column (e.g. ``date``). Mergeable partials re-add
    (sum/count/sumsq/hists/pixel counts), extremes re-extremize, and
    mean/std/cf are re-finalized from the merged partials — the exact
    fmin/fmax/+ merge semantics of the distributed drivers
    (``MODIS_Aggregation_DASK.py:127-134``).

    Array histograms merge with element-wise sums via ``zip_with`` chained
    through ``reduce``-style aggregation (JVM-side, no UDF).

    Finalized-only columns (daily ``cf_std``, ``cf_mean`` …) are dropped
    and recomputed from merged partials where those exist: cf_mean from
    cld/tot sums; cf_granule_mean/cf_granule_stddev from the
    cf_granule_{sum,count,sumsq} partials emitted by ``daily_grid``.
    (strict_compat's Q2 cf_std is intentionally daily-only — the reference
    drivers themselves disagree on its monthly form, SURVEY Q2.)
    """
    group_cols = group_cols or ["cell"]
    aggs = []
    for fname, dtype in staged.dtypes:
        if fname in group_cols or fname in ("lat_idx", "lon_idx", "granule_id", "date"):
            continue
        if fname.endswith("_min"):
            aggs.append(F.min(fname).alias(fname))
        elif fname.endswith("_max"):
            aggs.append(F.max(fname).alias(fname))
        elif fname.endswith(("_sum", "_sumsq", "_count", "_pix")) or fname in (
            "grid_count", "grid_count_compat"
        ):
            aggs.append(F.sum(fname).alias(fname))
        elif fname.endswith(("_hist", "_jhist")):
            # element-wise array sum: aggregate over the group with zip_with
            depth2 = dtype.startswith("array<array")
            if depth2:
                merge = lambda a, b: F.zip_with(  # noqa: E731
                    a, b, lambda x, y: F.zip_with(x, y, lambda p, q: p + q)
                )
            else:
                merge = lambda a, b: F.zip_with(a, b, lambda x, y: x + y)  # noqa: E731
            lst = F.collect_list(fname)
            rest = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
            aggs.append(
                F.aggregate(rest, F.element_at(lst, 1), merge).alias(fname)
            )
        # finalized columns (mean/std/cf_mean/...) are recomputed below
    merged = staged.groupBy(*group_cols).agg(*aggs)

    # re-finalize from merged partials
    out_cols: dict[str, F.Column] = {}
    names = set(merged.columns)
    for n in names:
        if n.endswith("_sum"):
            base = n[:-4]
            cnt = f"{base}_count"
            if cnt in names:
                out_cols[f"{base}_mean"] = F.col(n) / F.nullif(F.col(cnt), F.lit(0))
                ss = f"{base}_sumsq"
                if ss in names:
                    m = F.col(n) / F.nullif(F.col(cnt), F.lit(0))
                    # guard on count>0: greatest() skips NULLs, which would
                    # otherwise turn an empty cell's NULL std into 0.0
                    out_cols[f"{base}_stddev"] = F.when(
                        F.col(cnt) > 0,
                        F.sqrt(
                            F.greatest(
                                F.col(ss) / F.col(cnt) - m * m, F.lit(0.0)
                            )
                        ),
                    )
    if {"cld_pix", "tot_pix"} <= names:
        out_cols["cf_mean"] = F.col("cld_pix") / F.nullif(F.col("tot_pix"), F.lit(0))
    return merged.withColumns(out_cols)
