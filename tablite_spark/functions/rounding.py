"""xround — round numbers/timestamps to an arbitrary multiple.

Reference: ``DataTypes.round`` (tablite/datatypes.py:325-371,
tablite/tools.py:24): round value to nearest multiple (e.g. 30-minute
buckets), direction up/down/nearest.

Spark-native: pure arithmetic on the JVM side — stays inside
whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xround(col: Column, multiple, up: bool | None = None) -> Column:
    """Round ``col`` to a multiple. ``up=None`` → nearest (half away
    from zero, like the reference), True → ceil, False → floor.

    For timestamps pass ``multiple`` in seconds and a timestamp column;
    the result is a timestamp snapped to the bucket.
    """
    m = F.lit(multiple)
    q = col / m
    if up is None:
        # half away from zero
        snapped = F.when(col >= 0, F.floor(q + 0.5)).otherwise(-F.floor(-q + 0.5))
    elif up:
        snapped = F.ceil(q)
    else:
        snapped = F.floor(q)
    return snapped * m


def xround_ts(col: Column, seconds: int, up: bool | None = None) -> Column:
    """xround for timestamps: snap to ``seconds``-sized buckets."""
    epoch = F.unix_timestamp(col)
    return F.timestamp_seconds(xround(epoch, seconds, up).cast("long"))
