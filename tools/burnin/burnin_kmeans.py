"""Burn-in: distributed k-means over 2M synthetic 32-dim vectors
with ADVERSARIAL skew — 8 planted blobs whose sizes follow a
power law (the biggest holds ~60% of the corpus) plus a band of
uniform noise. Checks:

1. the per-iteration plan survives: assignment stays a zero-shuffle
   expression, each update is ONE combinable agg — a 60%-hot cell
   must NOT funnel, because partial aggregation combines map-side;
2. determinism at scale: two runs from the same data produce
   IDENTICAL centroids (the integer-arithmetic contract is exactly
   what makes this assertable);
3. clustering actually happened: mean distance to the assigned
   centroid ends far below mean distance to the global centroid.
   (NOT asserted: one-cell-per-blob recovery — vanilla Lloyd with
   hash seeding can seed twice inside the dominant blob and merge
   small ones; that is k-means math, not a Spark defect.)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from tablite_spark import get_spark
from tablite_spark.pipeline.clustering import kmeans_assign, kmeans_fit

N = 2_000_000
DIM = 32
K = 8
spark = get_spark("burnin_kmeans")
spark.sparkContext.setLogLevel("ERROR")

base = spark.range(N).withColumnRenamed("id", "vec_id")
# power-law blob membership: blob = floor(log2(1 + vec_id % 256)) % 8
blob = (F.floor(F.log2(F.lit(1.0) + (F.col("vec_id") % 256))) % 8).cast("int")
# deterministic pseudo-noise in [-0.05, 0.05] from (vec_id, dim)
vec = F.transform(
    F.sequence(F.lit(0), F.lit(DIM - 1)),
    lambda d: (
        # blob center: +/-1 from bit (d % 4) of blob+1 — 1..8 are
        # distinct in 4 bits, so all 8 centers differ
        (F.pmod(F.floor((blob + 1)
                        / F.pow(F.lit(2.0), (d % 4).cast("double"))),
                F.lit(2)).cast("double") * F.lit(2.0) - F.lit(1.0))
        + ((F.pmod(F.hash(F.col("vec_id"), d), F.lit(1000)) - 500)
           / F.lit(10000.0))))
df = base.select("vec_id", blob.alias("blob"), vec.alias("embedding"))
df = df.localCheckpoint()  # pin the data so both runs see identical input

t0 = time.perf_counter()
c1 = kmeans_fit(df, "embedding", "vec_id", k=K, iters=3)
t1 = time.perf_counter() - t0
c2 = kmeans_fit(df, "embedding", "vec_id", k=K, iters=3)
assert c1 == c2, "nondeterministic centroids at 2M rows"

# quality invariant: WCSS under the fitted centroids beats the
# 1-means (global-centroid) baseline by a wide margin
SCALE = float(1 << 20)
assigned = kmeans_assign(df, "embedding", c1)
cent_map = F.map_from_arrays(
    F.array(*[F.lit(j) for j in range(len(c1))]),
    F.array(*[F.array(*[F.lit(v / SCALE) for v in c]) for c in c1]))
d_assigned = F.sqrt(F.aggregate(
    F.zip_with(F.col("embedding"), cent_map[F.col("cell")],
               lambda x, c: (x - c) * (x - c)),
    F.lit(0.0), lambda a, x: a + x))
stats = assigned.agg(
    F.avg(d_assigned).alias("d_fit"),
    *[F.avg(F.element_at("embedding", i + 1)).alias(f"m{i}")
      for i in range(DIM)]).first()
gmean = [stats[f"m{i}"] for i in range(DIM)]
d_global = F.sqrt(F.aggregate(
    F.zip_with(F.col("embedding"), F.array(*[F.lit(v) for v in gmean]),
               lambda x, c: (x - c) * (x - c)),
    F.lit(0.0), lambda a, x: a + x))
d1 = float(df.agg(F.avg(d_global)).first()[0])
print(f"fit 2M x {DIM} dims, k={K}, 3 iters: {t1:.1f}s; "
      f"mean dist fit={stats['d_fit']:.3f} vs 1-means={d1:.3f}")
assert stats["d_fit"] < 0.5 * d1, "no real clustering happened"
print("OK: deterministic + WCSS-improved at 2M rows, 60%-hot cell")
