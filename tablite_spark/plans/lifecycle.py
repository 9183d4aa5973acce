"""Checkpoint lifecycle: deterministic block release for iterative
operators.

``DataFrame.localCheckpoint()`` persists the physical plan's RDD at
the RDD level (``rdd.persist`` + materialize) and wraps it in a
``LogicalRDD`` plan. ``DataFrame.unpersist()`` only talks to the SQL
CacheManager, so it is a **silent no-op** for checkpointed frames —
an iterative operator that checkpoints per round (PageRank, hash-min
connected components, Lloyd's) would pin one copy of its state in
executor storage per iteration until the JVM's ContextCleaner happens
to notice the weak reference die. At a 100 TB state size that
nondeterminism is an OOM, not a nuisance.

:func:`unpersist_local_checkpoint` releases the blocks
deterministically by unpersisting the ``LogicalRDD``'s underlying RDD
itself. Callers drop a superseded iteration's checkpoint as soon as
the next one has materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["unpersist_local_checkpoint"]


def unpersist_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Free the storage blocks behind a ``df.localCheckpoint()``
    result. Returns True if a checkpointed RDD was found and
    unpersisted; False for non-checkpoint frames (best-effort — the
    ContextCleaner remains the fallback). The frame must not be used
    again afterwards: its lineage was truncated at the checkpoint, so
    the data is unrecoverable by design."""
    try:
        plan = df._jdf.queryExecution().logical()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(blocking)
        return True
    except Exception:
        return False  # py4j surface changed: leave it to ContextCleaner
