"""Burn-in A: BM25 over 5M docs with a pure stopword probe (10x the
round-6 500k receipt). 20 planted relevant docs share identical filler
so relevance is monotone in needle count; the stopword query matches
the ENTIRE corpus and must not funnel."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from tablite_spark import get_spark
from tablite_spark.pipeline.retrieval import bm25_search

N = 5_000_000
spark = get_spark("burnin_bm25")
spark.sparkContext.setLogLevel("ERROR")

base = spark.range(N).withColumnRenamed("id", "doc_id")
# every doc: stopword "the" + 20 unique filler tokens;
# docs 0..19: += (doc_id+1) copies of "needle"
filler = F.concat_ws(" ", F.transform(
    F.sequence(F.lit(1), F.lit(20)),
    lambda j: F.concat(F.lit("f"), (F.col("doc_id") * 100 + j).cast("string"))))
needles = F.when(
    F.col("doc_id") < 20,
    F.concat(F.lit(" "), F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.col("doc_id").cast("int")),
        lambda _: F.lit("needle"))))).otherwise(F.lit(""))
docs = base.select("doc_id",
                   F.concat(F.lit("the "), filler, needles).alias("text"))

queries = spark.createDataFrame(
    [(1, "needle"), (2, "the")], "qid long, qtext string")

t0 = time.perf_counter()
res = bm25_search(docs, queries, k=10).collect()
dt = time.perf_counter() - t0

q1 = sorted([r for r in res if r["qid"] == 1], key=lambda r: r["rank"])
q2 = [r for r in res if r["qid"] == 2]
# expected: needle query returns doc_ids 19..10 (highest needle counts)
ids = [r["doc_id"] for r in q1]
scores = [r["score"] for r in q1]
assert ids == list(range(19, 9, -1)), ids
assert all(scores[i] > scores[i + 1] for i in range(len(scores) - 1)), scores
assert len(q2) == 10, len(q2)  # stopword probe returns a full top-k
print(f"BM25 5M burn-in OK: {dt:.1f}s, loadavg={os.getloadavg()}")
print("needle top-10 ids:", ids)
print("stopword top-10 ids:", sorted(r['doc_id'] for r in q2))
spark.stop()
