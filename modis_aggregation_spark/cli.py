"""Command-line driver mirroring the reference's serial entry point.

The reference takes 15-16 positional args + two config CSVs (reference
``MODIS_Aggregation/aggregate_functions.py:459-504``; invocation shape in
``examples/local_execution/MODIS_Aggregation_Local_Commands.sh:21``). This
CLI accepts the same information as named flags (typed, validated in
``AggregationSpec``) plus the reference's own CSV formats for the variable
and joint-histogram configs.

Usage:
    python -m modis_aggregation_spark.cli \
        --pixels fixtures/pixels.parquet --granules fixtures/granules.parquet \
        --lat0 -20 --lat1 20 --lon0 0 --lon1 35 --dlat 1 --dlon 1 \
        --start 2008-01-01 --end 2008-01-02 \
        --variables examples_input.csv --output /tmp/l3_daily
"""

from __future__ import annotations

import argparse
import sys

from modis_aggregation_spark.config import (
    ALL_STATS,
    AggregationSpec,
    VariableSpec,
    parse_jhist_csv,
    parse_variable_csv,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="modis_aggregation_spark",
        description="L2→L3 grid aggregation (PySpark-native)",
    )
    p.add_argument("--pixels", required=True, help="pixel parquet path")
    p.add_argument("--granules", required=True, help="granule catalog parquet path")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--lat0", type=float, default=-90.0)
    p.add_argument("--lat1", type=float, default=90.0)
    p.add_argument("--lon0", type=float, default=-180.0)
    p.add_argument("--lon1", type=float, default=180.0)
    p.add_argument("--dlat", type=float, default=1.0)
    p.add_argument("--dlon", type=float, default=1.0)
    p.add_argument("--start", default="2008-01-01")
    p.add_argument("--end", default="2008-01-01")
    p.add_argument("--sampling", type=int, default=1)
    p.add_argument(
        "--stats", nargs="*", default=list(ALL_STATS), choices=list(ALL_STATS)
    )
    p.add_argument("--variables", help="reference-format variable CSV")
    p.add_argument("--jhist", help="reference-format joint-histogram CSV")
    p.add_argument("--var", nargs="*", default=[], help="bare variable names")
    p.add_argument("--strict-compat", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--hdf5", help="also export MYD08-style HDF5 to this path")
    p.add_argument("--png", help="also export a cf_mean quick-look PNG to this path")
    return p


def spec_from_args(args: argparse.Namespace) -> AggregationSpec:
    variables: tuple[VariableSpec, ...] = ()
    joint_hists = ()
    if args.variables:
        variables = parse_variable_csv(args.variables)
    if args.var:
        variables = variables + tuple(VariableSpec(name=v) for v in args.var)
    if args.jhist:
        joint_hists = parse_jhist_csv(args.jhist, variables)
    return AggregationSpec(
        lat_bounds=(args.lat0, args.lat1),
        lon_bounds=(args.lon0, args.lon1),
        grid=(args.dlat, args.dlon),
        start_date=args.start,
        end_date=args.end,
        sampling=args.sampling,
        stats=tuple(args.stats),
        variables=variables,
        joint_hists=joint_hists,
        strict_compat=args.strict_compat,
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spec = spec_from_args(args)

    from modis_aggregation_spark import get_spark
    from modis_aggregation_spark.plans.pipeline import daily_grid
    from modis_aggregation_spark.sinks.writers import (
        export_hdf5,
        export_png,
        write_grid_parquet,
    )

    spark = get_spark("modis_aggregation_cli")
    pixels = spark.read.parquet(args.pixels)
    granules = spark.read.parquet(args.granules)
    grid = daily_grid(spark, spec, pixels, granules)
    if args.hdf5 or args.png:
        # each export collects the (bounded, ~MB) grid on the driver —
        # persist so the extra jobs re-read cached partitions instead of
        # recomputing the aggregation per sink
        grid = grid.persist()
    write_grid_parquet(grid, args.output, overwrite=args.overwrite)
    if args.hdf5:
        export_hdf5(grid, spec, args.hdf5, overwrite=args.overwrite)
    if args.png:
        export_png(grid, spec, args.png, overwrite=args.overwrite)
    print(f"wrote {spec.nlat}x{spec.nlon} grid to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
