"""Isolated per-query timing: min-of-N with loadavg stamps, the
winnow/dsir pin protocol from the r12/r13 verdicts applied to any
query. One Spark session, bench warm-up, then each named query is
forced through the noop sink N times.

Usage:
    python tools/qtime.py [-n RUNS] [sf_dir] <query> [query ...]

Prints one line per query: name, min, runs, loadavgs. Honest only on
a quiet host — check loadavg before trusting the numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    runs_n = 3
    if argv and argv[0] == "-n":
        runs_n = int(argv[1])
        argv = argv[2:]
    if argv and os.path.isdir(argv[0]):
        sf_dir, names = argv[0], argv[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", argv

    import __spark_entry__ as entry_mod
    import bench
    from tablite_spark import get_spark
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warm-up as bench.py: JVM/parquet footers + python workers
    force(qs["q1_pricing_summary"](spark, sf_dir))
    par = spark.sparkContext.defaultParallelism
    force(spark.range(par * 4).repartition(par)
          .mapInPandas(lambda it: it, "id long"))

    for name in names:
        fn = bench.BENCH_OVERRIDES.get(name) or qs[name]
        runs, loads = [], []
        for _ in range(runs_n):
            loads.append(round(os.getloadavg()[0], 2))
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"QTIME {name} min={min(runs)} runs={runs} "
              f"loadavg={loads}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
