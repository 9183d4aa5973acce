"""Burn-in: preference-pair distillation over 20M scored responses
where ONE prompt holds 50% of the corpus (the hot-prompt shape the
no-window design exists for). Asserts the exact chosen/rejected ids
for the hot prompt (closed-form fixture) and that the run completes
in one combinable-agg pass — a ranking-window implementation would
sort 10M rows in a single task here."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from tablite_spark import get_spark
from tablite_spark.pipeline.preference import build_preference_pairs

N = 20_000_000
spark = get_spark("burnin_preference")
spark.sparkContext.setLogLevel("ERROR")

base = spark.range(N).withColumnRenamed("id", "rid")
# even rid -> prompt 0 (the hot prompt); odd rid -> prompts 1..9999
prompt = F.when(F.col("rid") % 2 == 0, F.lit(0)) \
    .otherwise(1 + (F.col("rid") % 9999)).cast("long")
# closed-form scores: hot prompt's max lives at rid=2, min at rid=0
score = F.when(F.col("rid") == 2, F.lit(10 ** 9)) \
    .otherwise((F.col("rid") % 1000).cast("long"))
df = base.select(prompt.alias("prompt_id"), F.col("rid"),
                 F.concat(F.lit("r"), F.col("rid")).alias("text"),
                 score.alias("score"))

t0 = time.perf_counter()
out = build_preference_pairs(df, "prompt_id", "rid", "text", "score",
                             margin=1.0)
hot = out.filter(F.col("prompt_id") == 0).collect()
n_pairs = out.count()
dt = time.perf_counter() - t0

assert len(hot) == 1
# chosen: the planted max; rejected: score 0, tie -> LOWEST rid (=0:
# the first even rid with rid%1000==0)
assert hot[0]["chosen_id"] == 2 and hot[0]["rejected_id"] == 0, hot
assert hot[0]["pair_margin"] == 10 ** 9
print(f"20M responses, 10M-response hot prompt: {dt:.1f}s, "
      f"{n_pairs} pairs, hot pair exact")
