"""Burn-in C: bucketed fact-fact join at 50M x 50M with AQE ON.
Verifies (1) the co-located SMJ plans ZERO exchanges with AQE enabled
(AQE must not re-introduce a shuffle or demote the bucketed scan),
(2) the join result is exact (closed-form row count + aggregate), and
(3) a bucket-key equality lookup prunes to 1-of-n buckets."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from tablite_spark import get_spark
from tablite_spark.operators.bucketing import (
    bucketed_join, forced_bucketed_scan, read_bucketed, save_bucketed,
)

N = 50_000_000
BUCKETS = 64
spark = get_spark("burnin_bucket")
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.adaptive.enabled") == "true", "AQE off?"

tmp = tempfile.mkdtemp(prefix="burnin_bucket_")
try:
    left = (spark.range(N).withColumnRenamed("id", "k")
            .withColumn("lv", (F.col("k") % 1000).cast("long")))
    # right: every key appears once, values offset so the join sum has
    # a closed form
    right = (spark.range(N).withColumnRenamed("id", "k")
             .withColumn("rv", (F.col("k") % 7).cast("long")))
    t0 = time.perf_counter()
    save_bucketed(left, "bl", ["k"], BUCKETS, path=f"{tmp}/bl")
    save_bucketed(right, "br", ["k"], BUCKETS, path=f"{tmp}/br")
    t_write = time.perf_counter() - t0

    j = bucketed_join(spark, "bl", "br", ["k"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    t0 = time.perf_counter()
    agg = j.agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("lv") + F.col("rv")).alias("s")).first()
    t_join = time.perf_counter() - t0
    # executed plan AFTER the action (AQE finalizes at runtime)
    plan_final = j._jdf.queryExecution().executedPlan().toString()
    n_exchanges_final = plan_final.count("Exchange")
    assert agg["n"] == N, agg
    exp = (N // 1000) * sum(range(1000)) + (N // 7) * sum(range(7)) \
        + sum(range(N % 7))
    assert agg["s"] == exp, (agg["s"], exp)
    assert n_exchanges == 0, f"planned {n_exchanges} exchanges:\n{plan[:2000]}"
    assert n_exchanges_final == 0, f"AQE added exchanges:\n{plan_final[:2000]}"

    # bucket-pruned point lookup
    with forced_bucketed_scan(spark):
        q = read_bucketed(spark, "bl").filter(F.col("k") == 12_345_678)
        t0 = time.perf_counter()
        rows = q.collect()
        t_lookup = time.perf_counter() - t0
        pplan = q._jdf.queryExecution().executedPlan().toString()
    assert len(rows) == 1 and rows[0]["lv"] == 12_345_678 % 1000
    assert "SelectedBucketsCount: 1 out of 64" in pplan, pplan[:1500]

    print(f"bucketed join 50Mx50M burn-in OK: write={t_write:.1f}s "
          f"join+agg={t_join:.1f}s (0 exchanges, AQE on) "
          f"lookup={t_lookup:.2f}s (1/64 buckets) "
          f"loadavg={os.getloadavg()}")
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS bl")
    spark.sql("DROP TABLE IF EXISTS br")
spark.stop()
