"""Micro-batch fixture staging and scale-adaptive streaming shuffle
partitions (optimization round r14).

Two costs dominated every streaming registry query at bench scale,
neither of them the streaming engine itself (measured with
``StreamingQuery.recentProgress`` + phase timers, receipts in
OPTIMIZATION_r14.md):

1. **Fixture staging.** Each micro-batch file was produced by
   ``part.coalesce(1).write.parquet(...)``. For a ``createDataFrame``
   sentinel row that plan is pathological: the local relation is
   parallelized over ``defaultParallelism`` Python-RDD slices and
   ``coalesce(1)`` computes all of them INSIDE ONE TASK, serially
   re-entering the Python worker per slice — measured 5-8 s per
   1-row file (guide §4: the Python boundary). Staging here collects
   the (small, driver-bounded by construction) fixture part as ONE
   Arrow table (`DataFrame.toArrow` — a parallel scan + one Arrow
   transfer) and writes the single parquet file with pyarrow:
   ~0.1-0.3 s per batch, no Spark job at all for pure-local parts.

2. **State-store / shuffle fan-out.** A micro-batch engine commits
   every stateful operator's state store ONCE PER PARTITION PER
   BATCH, and `spark.sql.shuffle.partitions` (sized for the batch
   engine's large scans) fixes that partition count at query start —
   AQE never applies to streaming. 32 partitions × 4-8 micro-batches
   of a ~2 MB fixture is pure per-task + per-commit overhead
   (guide §2.2: many tiny blocks): measured 2× end-to-end on the
   session-window query (7.7 s → 3.7 s at 8 partitions, identical
   output). :func:`stream_shuffle_partitions` derives the partition
   count from the STAGED INPUT BYTES (guide §2: make partitioning
   scale-adaptive — derive from input size, never a constant tuned
   for one deployment): ``ceil(bytes / per_partition_bytes)``,
   floored at min(8, defaultParallelism), capped at
   ``defaultParallelism`` so the driver's lower-core-count scaling
   run keeps its meaning. The floor matters: a per-query partition
   sweep (OPTIMIZATION_r14.md) showed 4 partitions STARVES the
   state-/Python-heavy operators (applyInPandasWithState loops,
   100k-key dedup state serialize per commit) — e.g.
   dropDuplicatesWithinWatermark 12.6 s @4 vs 2.8 s @8 vs 4.6 s @32
   — while 8-16 beats 32 across every streaming query measured. At
   100 TB the same formula saturates at the cluster's parallelism —
   production deployments should raise
   ``SPARK_GRAFT_STREAM_PARTITION_BYTES`` toward 64-128 MB per state
   partition, the normal streaming-state sizing.

Partition count never changes WHAT a streaming query computes — only
how its state is sharded — and a restart-from-checkpoint reuses the
count pinned in the checkpoint's offset log, so the forced-replay
fixtures stay valid.
"""

from __future__ import annotations

import contextlib
import math
import os

__all__ = ["stage_stream_batches", "staged_bytes",
           "stream_shuffle_partitions"]


def stage_stream_batches(root: str, name: str, parts,
                         base_mtime: int = 1_700_000_000) -> str:
    """Stage each part as ONE mtime-pinned parquet file under
    ``root/name`` so a file-source readStream with
    ``maxFilesPerTrigger=1`` replays them as ordered micro-batches.

    ``parts`` entries are small fixture DataFrames (collected via one
    Arrow transfer each — fixture staging over tiny frames, never a
    data-path shape) or ready-made ``pyarrow.Table`` rows (sentinel
    batches — zero Spark jobs). Naive timestamp columns are cast to
    tz-UTC so the files carry the same adjusted-to-UTC parquet
    annotation Spark's own writer produced (session tz is UTC;
    values are bit-identical either way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(root, name)
    os.makedirs(src, exist_ok=True)
    for i, part in enumerate(parts):
        tbl = part if isinstance(part, pa.Table) else part.toArrow()
        fields, changed = [], False
        for f in tbl.schema:
            if pa.types.is_timestamp(f.type) and f.type.tz is None:
                fields.append(
                    pa.field(f.name, pa.timestamp(f.type.unit, "UTC")))
                changed = True
            else:
                fields.append(f)
        if changed:
            tbl = tbl.cast(pa.schema(fields))
        dst = os.path.join(src, f"batch{i}.parquet")
        pq.write_table(tbl, dst)
        t = base_mtime + i * 600
        os.utime(dst, (t, t))
    return src


def staged_bytes(*srcs: str) -> int:
    """Total bytes of the staged micro-batch files — the input-size
    signal :func:`stream_shuffle_partitions` scales from."""
    total = 0
    for src in srcs:
        for entry in os.listdir(src):
            p = os.path.join(src, entry)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    return total


@contextlib.contextmanager
def stream_shuffle_partitions(spark, *srcs: str,
                              per_partition_bytes: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` (= streaming state
    partitions; AQE never coalesces streaming shuffles) to a count
    derived from the staged input size, restoring the session value
    afterwards. See the module docstring for the sizing rationale and
    the production knob."""
    per = per_partition_bytes or int(os.environ.get(
        "SPARK_GRAFT_STREAM_PARTITION_BYTES", str(1 << 20)))
    n_bytes = staged_bytes(*srcs) if srcs else 0
    floor = min(8, spark.sparkContext.defaultParallelism)
    target = max(floor, min(spark.sparkContext.defaultParallelism,
                            math.ceil(n_bytes / per) if n_bytes else 1))
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(target))
    try:
        yield target
    finally:
        spark.conf.set(key, old)
