"""Count-driven broadcast decisions for iterative operators.

Iterative state (localCheckpoint frames) has UNKNOWN stats to
Catalyst, so every state ⋈ edges join plans as a sort-merge join that
shuffles the BIG side once per round. The fixpoint loops all compute
their state's row count anyway (convergence checks), so the broadcast
decision can be made from REAL numbers instead of missing estimates:
broadcast the node-bounded side iff its estimated bytes fit the
budget, else keep the shuffle join (the 100 TB-safe fallback — node
sets scale with the corpus). 256 MB is the optimization guide's "a
few hundred MB is usually fine" regime, far under the 8 GB broadcast
cap; production can move it via the env knob.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["maybe_broadcast", "BROADCAST_BYTES"]

BROADCAST_BYTES = int(os.environ.get(
    "SPARK_GRAFT_GRAPH_BROADCAST_BYTES", str(256 << 20)))


def maybe_broadcast(df: DataFrame, n_rows: int,
                    bytes_per_row: int) -> DataFrame:
    """``broadcast(df)`` iff ``n_rows * bytes_per_row`` fits the
    budget; ``df`` unchanged otherwise. Callers pass the row count
    they already computed — never an estimate."""
    if n_rows * bytes_per_row <= BROADCAST_BYTES:
        return F.broadcast(df)
    return df
