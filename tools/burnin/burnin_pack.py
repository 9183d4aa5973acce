"""Burn-in B: pack_sequences at 10M docs with mask_col AND boundaries
both ON (the combined path has only the 1M plain receipt). Exactness
checked via closed-form invariants: deterministic per-doc token
counts/values, so every window's content is a pure function of the
global stream position."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from tablite_spark import get_spark
from tablite_spark.pipeline.text import pack_sequences

N = 10_000_000
SEQ = 1024
spark = get_spark("burnin_pack")
spark.sparkContext.setLogLevel("ERROR")

# doc i: n_i = 1 + (i % 4) tokens, token values = global positions
# i*10+0.. so the packed stream must be exactly [pos -> value] with
# value deterministically derived from the source doc. Use token
# value = (doc_id % 97) repeated -- cheap, and lets us recompute the
# expected window content serially on the driver for spot windows.
docs = (spark.range(N).withColumnRenamed("id", "doc_id")
        .select("doc_id",
                F.transform(
                    F.sequence(F.lit(1),
                               (F.col("doc_id") % 4 + 1).cast("int")),
                    lambda j: (F.col("doc_id") % 97).cast("int"))
                .alias("ids"),
                F.transform(
                    F.sequence(F.lit(1),
                               (F.col("doc_id") % 4 + 1).cast("int")),
                    lambda j: (F.col("doc_id") % 2).cast("int"))
                .alias("mask")))

t0 = time.perf_counter()
out = pack_sequences(docs, "ids", "doc_id", SEQ, eos_id=50256,
                     boundaries=True, mask_col="mask", eos_mask=0)
out = out.cache()
n_windows = out.count()
dt = time.perf_counter() - t0

# total tokens: sum over i of (1 + i%4) + 1 EOS = N/4*(1+2+3+4) + N
total_tokens = N // 4 * (1 + 2 + 3 + 4) + N
exp_windows = total_tokens // SEQ
assert n_windows == exp_windows, (n_windows, exp_windows)

# every window exactly SEQ tokens; mask aligned (same length); doc
# starts strictly ascending, within [0, SEQ)
chk = out.select(
    F.size("input_ids").alias("n"),
    F.size("loss_mask").alias("m"),
    F.col("n_docs"),
    F.size("doc_starts").alias("nb"),
    F.element_at("doc_starts", 1).alias("b1"),
    F.element_at("doc_starts", -1).alias("blast"),
    (F.array_sort("doc_starts") == F.col("doc_starts")).alias("asc"),
).agg(
    F.min("n").alias("min_n"), F.max("n").alias("max_n"),
    F.min("m").alias("min_m"), F.max("m").alias("max_m"),
    F.sum("n_docs").alias("docs_sum"),
    F.min("b1").alias("min_b1"), F.max("blast").alias("max_bl"),
    F.min(F.col("asc").cast("int")).alias("all_asc"),
).first()
assert chk["min_n"] == chk["max_n"] == SEQ, chk
assert chk["min_m"] == chk["max_m"] == SEQ, chk
assert chk["min_b1"] >= 0 and chk["max_bl"] < SEQ, chk
assert chk["all_asc"] == 1, chk

# serial replay of windows 0, 1, and the LAST window: recompute the
# expected token stream for their position ranges on the driver
def stream_chunk(lo, hi):
    toks, masks, starts, pos, i = [], [], [], 0, 0
    # skip docs wholly before lo: doc i occupies n_i+1 slots
    # (closed form: 4 docs = 14 slots)
    full, rem = divmod(lo, 14)
    i = full * 4
    pos = full * 14
    while pos < hi:
        n = 1 + (i % 4)
        if pos >= lo:
            starts.append(pos - lo)
        for _ in range(n):
            if lo <= pos < hi:
                toks.append(i % 97)
                masks.append(i % 2)
            pos += 1
        if lo <= pos < hi:
            toks.append(50256)
            masks.append(0)
        pos += 1
        i += 1
    return (toks[:hi - lo], masks[:hi - lo],
            [s for s in starts if 0 <= s < hi - lo])

for sid in (0, 1, 73, exp_windows - 1):
    row = out.filter(F.col("seq_id") == sid).first()
    lo, hi = sid * SEQ, (sid + 1) * SEQ
    toks, masks, starts = stream_chunk(lo, hi)
    assert row["input_ids"] == toks, (sid, row["input_ids"][:8], toks[:8])
    assert row["loss_mask"] == masks, sid
    # serial replay appends offset 0 only when a doc STARTS at lo, so
    # it IS the contract ("0 excluded when the window opens mid-doc")
    assert row["doc_starts"] == starts, (sid, row["doc_starts"][:5],
                                         starts[:5])

print(f"pack_sequences 10M burn-in OK: {n_windows} windows of {SEQ}, "
      f"{dt:.1f}s, loadavg={os.getloadavg()}")
spark.stop()
