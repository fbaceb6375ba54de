"""Lineage truncation for iterative DataFrame algorithms.

The Catalyst landmine (BENCH.md finding on plan cloning, JVM edition):
a loop whose round N+1 plan references round N's DataFrame k>1 times
grows the LOGICAL plan k-fold per round — persist() caches data but
does NOT truncate the plan, so ten rounds of a 3-reference loop produce
a 3^10-node tree (observed: a 2 GiB plan string and minutes of analysis
time on a 100-vertex graph). Every iterative operator here cuts the
plan back to a leaf each round instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a plan-leaf DataFrame over the result.

    Uses reliable ``checkpoint`` when the session has a checkpoint dir
    (the cluster configuration — survives executor loss, required for
    long chains on preemptible fleets); falls back to ``localCheckpoint``
    (executor-local blocks, the standard GraphFrames-style choice for
    short synchronous loops). Blocks from superseded rounds are released
    by the ContextCleaner once the previous round's DataFrame goes out
    of scope.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
