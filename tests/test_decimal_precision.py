"""The five sum-heavy contract queries (r2/r3/r5/r36/r39) accumulate
~1e9-scale revenue; double accumulation diverges from the oracle by one
ulp at sf0.1 (relative ~4e-16 — the float64 mantissa floor), which the
6dp-rounding contract cannot absorb.  Round 4 stages those sums through
DECIMAL on BOTH sides (exact integer arithmetic over the 2/4/6-dp source
values, final cast back to DOUBLE) so equality is exact at any SF.

This test locks the property the staging buys: bit-exact (==, no
tolerance) agreement between the Spark result and the DuckDB oracle on
every value cell — a plain float compare, not the driver's rounded hash.
"""

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
STAGED = ["r2_tpch_q1", "r3_join_chain", "r5_rollup", "r36_tpch_q19",
          "r39_grouping_sets"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", STAGED)
def test_decimal_staged_sums_bit_exact(spark, duck, name):
    spark_pdf = (
        entry.queries()[name](spark, SF_DIR).toPandas()
    )
    oracle_pdf = duck.execute(entry.oracle_sql()[name]).df()
    cols = sorted(spark_pdf.columns)
    assert cols == sorted(oracle_pdf.columns)
    a = spark_pdf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    b = oracle_pdf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    assert len(a) == len(b)
    # check_exact: bit-exact floats (NaN==NaN allowed); dtype width relaxed
    # (DuckDB count() is HUGEINT->object/float in pandas)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a, b.astype(a.dtypes.to_dict()), check_exact=True
    )
