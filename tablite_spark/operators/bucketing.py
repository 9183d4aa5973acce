"""Bucketed tables — shuffle-free co-located joins and bucket-pruned
point lookups.

At 100 TB the dominant cost of a fact-fact join is the shuffle of
both sides. Pre-bucketing each table on the join key (hash(key) %
n_buckets files per partition, written once) makes every subsequent
join on that key exchange-FREE: Spark's bucketed scan reports its
output partitioning as hash(key), so sort-merge join needs no
Exchange on either side — the plan gate in tests/test_plans.py pins
zero shuffles. Equality filters on the bucket key additionally prune
to 1-of-n buckets at scan time (``SelectedBucketsCount`` in the
plan).

Reference parity: the reference engine keys lookups on sorted
column pages (tablite core/base: index/lookup); bucketing is the
Spark-native equivalent of that pre-organized layout, generalized to
co-located joins.

Bucket counts should be chosen so each bucket file lands in the
100 MB–1 GB range at the target scale; both sides of a co-located
join must use the SAME key set and bucket count (Spark can stitch
mismatched counts only when one divides the other, and only with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def forced_bucketed_scan(spark: SparkSession):
    """Force bucketed scans for point lookups. Spark's planner
    auto-DISABLES bucketed scans when nothing downstream needs the
    hash partitioning (``Bucketed: false (disabled by query
    planner)``) — right for full scans (more parallelism), wrong for
    an equality lookup on the bucket key, where the 1-of-n
    ``SelectedBucketsCount`` prune is the whole point. Build AND
    execute the lookup inside this context (planning happens at
    action time)."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def save_bucketed(df: DataFrame, table: str, keys: list[str],
                  n_buckets: int, sort_by: list[str] | None = None,
                  path: str | None = None) -> None:
    """Write ``df`` as a bucketed+sorted parquet table. ``sort_by``
    defaults to ``keys`` so each bucket FILE is locally sorted.
    Note Spark still plans a defensive in-partition Sort under a
    merge join unless every bucket holds exactly one file (it cannot
    prove sortedness across multiple files per bucket); the win this
    module gates on is the absence of EXCHANGES — the sort is local,
    cheap on pre-sorted runs, and never moves data. ``path`` pins an
    explicit location (else the session warehouse dir)."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, *keys).sortBy(*(sort_by or keys)))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def register_bucketed(spark: SparkSession, table: str, path: str,
                      keys: list[str], n_buckets: int,
                      sort_by: list[str] | None = None) -> None:
    """(Re-)register existing bucketed parquet files as a catalog
    table. The bucket spec lives in table METADATA, not the files —
    with the default in-memory catalog a new session sees only the
    files, and a plain ``spark.read.parquet`` would silently drop the
    co-location guarantee (joins would shuffle again). This rebuilds
    the ``CLUSTERED BY ... INTO n BUCKETS`` metadata over the path;
    the schema is inferred from the parquet footers."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in schema.fields)
    keys_sql = ", ".join(f"`{k}`" for k in keys)
    sort_sql = ", ".join(f"`{k}`" for k in (sort_by or keys))
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING PARQUET "
        f"CLUSTERED BY ({keys_sql}) SORTED BY ({sort_sql}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'")


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a
    plain ``spark.read.parquet`` of the files would DROP the spec and
    reintroduce join shuffles)."""
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str,
                  right_table: str, on: list[str],
                  how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket keys with zero
    exchanges. The merge hint pins sort-merge join — a broadcast
    would also be shuffle-free but stops scaling when the "small"
    side grows; SMJ over co-located buckets scales to fact-fact."""
    left = read_bucketed(spark, left_table)
    right = read_bucketed(spark, right_table).hint("merge")
    return left.join(right, on=on, how=how)
