"""Preference-pair construction — DPO/RLHF dataset prep, Spark-first.

Post-training pipelines (DPO, RLHF reward modeling — public recipes:
Rafailov et al. 2023 arXiv:2305.18290, InstructGPT) consume
``(prompt, chosen, rejected)`` triples distilled from many scored
responses per prompt. At corpus scale the distillation must be a
single combinable aggregation, not a ranking window: a hot prompt
with millions of sampled responses would funnel a window's
partition into one task, while ``max(struct(...))`` keeps partial
aggregation map-side (the ``lookup`` / ``cluster_dedup_keep_best``
argmax pattern).

Semantics per prompt:

- **chosen** = the response with the highest score; ties break to
  the LOWEST response id (``max(struct(score, -id, ...))``).
- **rejected** = the response with the lowest score; ties break to
  the LOWEST response id (``min(struct(score, id, ...))``).
- pairs are kept only when ``chosen_score - rejected_score >=
  margin`` AND the two responses differ — a prompt whose responses
  all tie yields no training signal and is dropped.
- optional ``max_len_ratio`` drops length-confounded pairs (a known
  DPO failure mode: the model learns "longer is better"): keep only
  ``1/r <= len(chosen)/len(rejected) <= r``.

The response text rides INSIDE the agg structs, so the operator is
one shuffle on ``prompt_col`` total — no join-back to fetch texts.
Struct comparison never reaches the text field: ``(score, ±id)`` is
already unique per response.

The reference engine has no preference-pair operator; this is a
beyond-reference capability for the training-data pipeline. The
``preference_pairs_docs`` oracle replays the argmax/argmin structs
and the margin filter in DuckDB over the real documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_preference_pairs"]


def build_preference_pairs(df: DataFrame, prompt_col: str,
                           id_col: str, text_col: str,
                           score_col: str, margin: float = 0.0,
                           max_len_ratio: float | None = None) -> DataFrame:
    """Distill scored responses into one ``(chosen, rejected)`` pair
    per prompt. Returns columns: ``prompt_col``, ``chosen_id``,
    ``rejected_id``, ``chosen_text``, ``rejected_text``,
    ``pair_margin``. One combinable groupBy — plan-gated no-Window."""
    ch = F.max(F.struct(
        F.col(score_col).alias("s"),
        (-F.col(id_col)).alias("negid"),
        F.col(text_col).alias("t"))).alias("ch")
    rj = F.min(F.struct(
        F.col(score_col).alias("s"),
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"))).alias("rj")
    agg = df.groupBy(prompt_col).agg(ch, rj)
    out = (agg.select(
        prompt_col,
        (-F.col("ch.negid")).alias("chosen_id"),
        F.col("rj.id").alias("rejected_id"),
        F.col("ch.t").alias("chosen_text"),
        F.col("rj.t").alias("rejected_text"),
        (F.col("ch.s") - F.col("rj.s")).alias("pair_margin"))
        .filter((F.col("pair_margin") >= F.lit(margin))
                & (F.col("chosen_id") != F.col("rejected_id"))))
    if max_len_ratio is not None:
        r = float(max_len_ratio)
        cl = F.length("chosen_text").cast("double")
        rl = F.length("rejected_text").cast("double")
        # cross-multiplied (no division): len-0 responses can't
        # produce NaN/Inf surprises, and the predicate stays exact
        # for integer lengths with an exactly-representable r
        out = out.filter((cl <= rl * F.lit(r)) & (rl <= cl * F.lit(r)))
    return out
