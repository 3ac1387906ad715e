"""Shared-frame materialization with a cluster-configurable mechanism.

Many operators derive one intermediate frame that several plan branches
consume (both sides of a self-join, a stats aggregate plus a scoring
projection, a count table plus its join-back).  Spark's exchange reuse
does not deduplicate such references — each consumer re-executes the
whole upstream subtree (measured repeatedly since round 12) — so the
frame must be materialized once.

The default mechanism is ``localCheckpoint``: cheapest locally (raw
internal rows in the block store, lineage truncated so downstream
planning stays flat, truthful size statistics for join elections).  Its
trade-off at cluster scale (docs/SCALING.md §materialization) is that
the blocks have NO replica and the truncated lineage cannot recompute
them: one executor loss after materialization fails the job instead of
recomputing.  Deployments that prefer resilience over the local-mode
win set::

    spark.modis_aggregation.materialize = persist    # keep lineage;
                                                     # executor loss
                                                     # recomputes
    spark.modis_aggregation.materialize = reliable   # HDFS/object-store
                                                     # checkpoint (needs
                                                     # sparkContext.
                                                     # setCheckpointDir)

and every routed operator switches mechanism without code changes.
Only SHARE sites route through here; iterative lineage-cutting loops
(connected components, pagerank, tokenizer merge rounds) require plan
truncation, which ``persist`` does not provide — they keep explicit
``localCheckpoint`` (see SCALING.md for the loop-site story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.modis_aggregation.materialize"


def shared_frame(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a multi-consumer frame once.

    ``eager=False`` (default): the first consumer's job computes and
    stores the frame, later consumers read the stored blocks — no extra
    barrier job (round-12 measurement: lazy strictly beats eager when a
    first consumer exists — minhash 1.659 none / 1.343 eager / 1.259
    lazy).  ``eager=True`` forces a materialization job NOW (only for
    frames whose construction must be pinned before fan-out, e.g. a
    nondeterministic query batch consumed by plan-pruning decisions
    OUTSIDE the frame's own plan).

    With ``persist`` mode, eager pins via an immediate ``count()``;
    callers must treat the result as opaque (no unpersist contract —
    share sites live for the query's lifetime).
    """
    mode = df.sparkSession.conf.get(CONF_KEY, "local")
    if mode == "persist":
        out = df.persist()
        if eager:
            out.count()
        return out
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
