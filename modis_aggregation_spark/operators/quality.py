"""Deequ-style data-quality constraint checking for pipeline tables.

The reference validates inputs ad hoc (resolution/shape asserts,
``MODIS_Aggregation/aggregate_functions.py:96-115``); a corpus pipeline
needs declarative checks that run WITH the data, not after it: null
ratios, range constraints, referential integrity between fact and
reference tables. Two scale rules drive the design:

* **One pass.** Every row-level rule compiles to a conditional sum inside
  a SINGLE global aggregation over the table — N rules cost one scan and
  one 1-row shuffle, never N scans. The 1-row aggregate is then unpivoted
  to (rule, total, violations, pass_rate) rows JVM-side.
* **Joins only where semantics demand.** Referential integrity is the one
  rule that needs a second table; it is a LEFT ANTI join against the
  parent keys (broadcast when the parent is a dimension), counting
  orphans — never a full join materialization.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Evaluate row-level constraints in one scan.

    ``rules`` maps rule name → boolean Column where True means the row
    PASSES. A NULL predicate result counts as a violation (unknown is
    not proof of validity). Returns one row per rule:
    (rule, total, violations, pass_rate).
    """
    if not rules:
        raise ValueError("check_constraints: no rules given")
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).cast("long").alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    one = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    # unpivot the 1-row wide aggregate to long form (narrow, JVM-side)
    melted = one.unpivot(
        ["__total"],
        [f"__v_{name}" for name in rules],
        "rule",
        "violations",
    )
    return melted.select(
        F.expr("substring(rule, 5)").alias("rule"),
        F.col("__total").cast("long").alias("total"),
        F.col("violations").cast("long").alias("violations"),
        F.round(
            (F.col("__total") - F.col("violations"))
            / F.nullif(F.col("__total"), F.lit(0)),
            6,
        ).alias("pass_rate"),
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    keys: Sequence[str] | Mapping[str, str],
) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` (FK
    violations). ``keys`` is either a list of shared column names or a
    mapping child_col → parent_col. LEFT ANTI join — only the parent's
    key columns travel, and Spark broadcasts them when small."""
    if isinstance(keys, Mapping):
        pairs = list(keys.items())
    else:
        pairs = [(k, k) for k in keys]
    pk = parent.select(
        *[F.col(p).alias(f"__pk_{c}") for c, p in pairs]
    ).dropDuplicates()
    cond = None
    for c, _ in pairs:
        eq = F.col(c).eqNullSafe(F.col(f"__pk_{c}"))
        cond = eq if cond is None else (cond & eq)
    return child.join(pk, cond, "left_anti")
