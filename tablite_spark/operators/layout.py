"""Multi-dimensional data layout for scan pruning — Z-order (Morton)
clustering.

At 100 TB, sorting by ONE column gives parquet row-group min/max
stats that prune scans on that column only; range predicates on a
second column still read everything. Z-ordering interleaves the bits
of several columns into one clustering key, so rows close in EVERY
dimension land in the same row groups — the min/max envelopes become
tight in all the interleaved columns at once and multi-column range
predicates prune to a small fraction of the file (the technique
behind Delta Lake's OPTIMIZE ZORDER BY and the classic UB-tree
literature; implemented here from the public idea, Spark-first).

Everything is integer-exact and expression-only:

* per-column normalization is (value - min) >> shift with
  shift = max(0, bit_length(range) - bits) — pure bit arithmetic, no
  float division, so the key is reproducible across engines (the
  ``zorder_events`` oracle has DuckDB replay it bit-for-bit);
* bit interleaving unrolls to bits x ncols shift/and/or expressions,
  all inside whole-stage codegen — no UDF;
* the layout op is ONE range-partition shuffle +
  ``sortWithinPartitions`` (no global sort barrier beyond Spark's
  range partitioner sampling).

Skew caveat: equal-width normalization keeps the arithmetic exact
and oracle-able; a heavily skewed column wastes some key bits (many
rows share a bucket). The standard remedy at scale is to z-order on
an already-roughly-uniform key (ids, hashes, time) or pre-bucket the
skewed column; rank-based normalization would need a global sort per
column, which defeats the one-shuffle design.

No reference analogue: tablite has no storage-layout surface (this
is part of the 100 TB extension surface, like pipeline/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# timestamp/date columns take part via an integer epoch view; NTZ
# uses timestamp_diff against a naive epoch literal — timezone-FREE,
# so the key is stable across session timezones (and matches DuckDB
# epoch_us semantics in the oracle)
_EPOCH = {
    "timestamp": F.unix_micros,
    "timestamp_ntz": lambda c: F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c),
    "date": lambda c: F.datediff(c, F.lit("1970-01-01")),
}


def _col_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """One aggregate pass → {col: (min, max)} as python ints."""
    views = {c: _to_long(df.schema[c].dataType.simpleString(), F.col(c))
             for c in cols}
    aggs = []
    for c in cols:
        aggs.append(F.min(views[c]).alias(f"__mn_{c}__"))
        aggs.append(F.max(views[c]).alias(f"__mx_{c}__"))
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}__"], row[f"__mx_{c}__"]
        out[c] = (int(mn or 0), int(mx or 0))
    return out


def _to_long(dtype: str, col: Column) -> Column:
    if dtype in _EPOCH:
        return _EPOCH[dtype](col)
    return col.cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16,
               out_col: str = "__zorder__",
               stats: dict | None = None) -> DataFrame:
    """Append the Z-order (Morton) key over ``cols``: each column is
    normalized to ``bits`` bits by ``(v - min) >> shift`` (shift
    chosen so the range fits), then the bits interleave
    column-round-robin from bit 0 upward. Supports integer, float
    (truncated to long), date and timestamp columns; NULLs normalize
    to bucket 0 (they cluster together at the low end — the same
    convention as a sorted layout). ``stats`` may pass precomputed
    {col: (min, max)} to skip the aggregate pass (e.g. reuse across
    incremental writes so keys stay comparable between runs)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if not 1 <= bits <= 21:
        raise ValueError("bits must be in 1..21 (bits*ncols <= 63)")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*ncols = {bits * len(cols)} exceeds the 63-bit key")
    stats = stats or _col_stats(df, cols)
    norms = []
    for c in cols:
        mn, mx = stats[c]
        rng = max(0, mx - mn)
        shift = max(0, rng.bit_length() - bits)
        vl = _to_long(df.schema[c].dataType.simpleString(), F.col(c))
        delta = F.coalesce(vl, F.lit(mn)) - F.lit(mn)
        norms.append(F.shiftright(delta, shift))
    k = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, n in enumerate(norms):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(n, b).bitwiseAND(F.lit(1)),
                            b * k + i))
    return df.withColumn(out_col, z)


def zorder_repartition(df: DataFrame, cols: list[str],
                       num_partitions: int | None = None,
                       bits: int = 16,
                       keep_key: bool = False) -> DataFrame:
    """Cluster ``df`` by the Z-order of ``cols``: ONE
    ``repartitionByRange`` shuffle on the key + an in-partition sort,
    so a subsequent parquet write produces row groups whose min/max
    stats are tight in every interleaved dimension — multi-column
    range predicates then prune at row-group (and with partitioned
    writes, file) granularity. This is the write-side half of data
    skipping; the read side is Spark's ordinary stats-based parquet
    filtering, which needs no cooperation."""
    out = zorder_key(df, cols, bits=bits)
    parts = [num_partitions] if num_partitions else []
    out = (out.repartitionByRange(*parts, F.col("__zorder__"))
           .sortWithinPartitions("__zorder__"))
    return out if keep_key else out.drop("__zorder__")
