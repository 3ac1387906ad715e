"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet), then compares row count,
column names, and values (column-name-sorted, row-sorted, 1e-9 float
tolerance). Exit code 1 on any mismatch.

Both sides are materialized through **pandas** (``toPandas()`` /
``res.df()``) and compared with dtype-KIND-sensitive keys, mirroring the
driver's hash layer: DuckDB HUGEINT (any integer ``sum``) lands as
float64 while Spark emits int64 — identical values, different dtype —
and the driver hashes them differently (round-1 r16/r23 reds). Integer
WIDTH is ignored (int32 vs int64 hash alike in pandas); float-vs-int is
a failure. Array/list cells fail loudly, mirroring the driver
canonicalizer's ``unhashable type: 'list'`` crash (round-1 r20 err).

Usage: python tools/check_correctness.py [sf_dir] [query ...]

With an explicit ``sf_dir`` the gate runs at that one scale. With NO
arguments it sweeps BOTH sf0.001 and sf0.01 (round 7: the x75 k-means
red was invisible at any single local scale — it flipped with the
partition layout, which differs per scale/corpus; a two-scale sweep is
the cheap local approximation of "a different layout than the one you
tuned on").
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class UnhashableCell(Exception):
    """An array/list/ndarray landed in an output cell (driver would crash)."""


def _norm_cell(v):
    """Type-kind-aware canonical key for one pandas cell.

    The kind tag ('i'/'f'/'b'/'s') is part of the key so a float64 5.0
    never equals an int64 5 — the exact divergence the driver's hasher
    punishes. Integer width is irrelevant (numpy int32 and int64 both
    land as ('i', v), matching pandas' value-based uint64 hashing).
    """
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        raise UnhashableCell(type(v).__name__)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        fv = float(v)
        return ("f", "NaN") if math.isnan(fv) else ("f", round(fv, 9))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, datetime.date) or type(v).__name__ in ("Timestamp", "datetime64"):
        # DuckDB DATE lands as pandas Timestamp(midnight) while Spark's
        # DateType stays datetime.date — the driver hashes these alike
        # (m11/r10 green in round 1), so canonicalize to ISO, date-only
        # when the time-of-day is midnight
        s = str(v)
        return ("s", s[:10] if s.endswith(" 00:00:00") else s)
    return ("s", str(v))  # decimals, anything else


def normalize_pdf(pdf):
    """Column-name-sorted, row-sorted list of canonical row keys."""
    import pandas as pd

    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or v is pd.NaT:
                vals.append(None)
            else:
                vals.append(_norm_cell(v))
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), cols


def _run_scale(spark, sf_dir, only, qs, osql):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            s_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in osql:
            print(f"weak  {name}: rows={len(s_pdf)} (no oracle)")
            continue
        try:
            d_pdf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        try:
            sn, sc = normalize_pdf(s_pdf)
        except UnhashableCell as e:
            failures.append(name)
            print(f"FAIL  {name}: spark output has unhashable {e} cell "
                  "(driver canonicalizer would crash)")
            continue
        try:
            dn, dc = normalize_pdf(d_pdf)
        except UnhashableCell as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle output has unhashable {e} cell "
                  "(driver canonicalizer would crash)")
            continue
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            continue
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sn)} duck={len(dn)}")
            continue
        bad = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
        if bad:
            failures.append(name)
            i = bad[0]
            print(f"FAIL  {name}: {len(bad)} differing rows; first:")
            print(f"      spark: {sn[i]}")
            print(f"      duck : {dn[i]}")
            continue
        print(f"ok    {name}: rows={len(sn)}")
    con.close()
    return failures


def main():
    if len(sys.argv) > 1:
        sf_dirs = [sys.argv[1]]
    else:
        sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from modis_aggregation_spark import get_spark

    spark = get_spark("correctness-check")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for sf_dir in sf_dirs:
        print(f"== {sf_dir} ==")
        failures += [
            f"{sf_dir.rstrip('/').rsplit('/', 1)[-1]}:{n}"
            for n in _run_scale(spark, sf_dir, only, qs, osql)
        ]

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
