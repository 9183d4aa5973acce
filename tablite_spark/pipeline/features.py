"""ML feature engineering over 100 TB: leakage-free target encoding.

Beyond the reference (tablite has no supervised-feature surface):
the tabular-ML staple — replace a categorical column with the
out-of-fold mean of a numeric target, smoothed toward a global prior
— computed without ever materializing per-row fold masks or looping
folds driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(df: DataFrame, cat_col: str, target_col: str,
                  id_col: str, folds: int = 5,
                  smoothing: float = 20.0,
                  out_col: str | None = None) -> DataFrame:
    """K-fold out-of-fold target encoding: every row gains
    ``out_col`` (default ``{cat_col}_te``) = the smoothed mean of
    ``target_col`` over OTHER folds' rows of the same category:

        te = (S_cat - S_cat,fold + m·prior) / (C_cat - C_cat,fold + m)

    where S/C are target sum/count, m = ``smoothing``, and ``prior``
    is the GLOBAL target mean excluding the row's own fold — so no
    row's own target ever reaches its encoding (leakage-free by
    construction). Folds are deterministic and engine-portable:
    ``pmod(id_col, folds)`` — reshuffles, retries and SQL oracles all
    agree. A category seen only in the row's own fold degrades to the
    prior (denominator ≥ m when m > 0; with m = 0 it is NULL, never a
    division error). NULL categories are REAL categories (the
    group_outliers lesson): the encoding join is null-safe. Rows with
    a NULL target still receive an encoding (they contribute nothing
    to S/C); rows with a NULL id form a NULL fold that behaves like
    any other fold (its own rows are excluded from its encoding) —
    deterministic, null-safe throughout.

    Scale shape: ONE combinable groupBy(cat, fold) collapses the
    corpus to a ≤ |categories|·(folds+1)-row summary; per-category
    totals and per-fold globals are window sums OVER THAT BOUNDED
    FRAME (never over data rows); the encodings join back UNHINTED so
    AQE broadcasts the tiny summary at runtime (and a 100M-category
    variant degrades to a keyed join instead of a forced-broadcast
    OOM). Two corpus scans (summary build + row join) — inherent to
    row-level output.
    """
    if folds < 2:
        raise ValueError("target_encode needs folds >= 2")
    out_col = out_col or f"{cat_col}_te"
    from pyspark.sql import Window
    t = F.col(target_col).cast("double")
    fold = F.pmod(F.col(id_col), F.lit(folds))
    s = (df.groupBy(F.col(cat_col).alias("__cat__"),
                    fold.alias("__fold__"))
         .agg(F.sum(t).alias("__s__"), F.count(t).alias("__c__")))
    wc = Window.partitionBy("__cat__")
    wf = Window.partitionBy("__fold__")
    s = (s.withColumn("__ts__",
                      F.coalesce(F.sum("__s__").over(wc), F.lit(0.0)))
          .withColumn("__tc__", F.sum("__c__").over(wc))
          .withColumn("__fs__",
                      F.coalesce(F.sum("__s__").over(wf), F.lit(0.0)))
          .withColumn("__fc__", F.sum("__c__").over(wf)))
    # lazy global scalar (tfidf discipline: no separate count job)
    g = s.agg(F.sum(F.when(F.col("__c__") >= 0, F.col("__s__")))
              .alias("__gs__"),
              F.sum(F.abs(F.col("__c__"))).alias("__gc__"))
    s = s.crossJoin(F.broadcast(g))
    oof_c = F.col("__tc__") - F.col("__c__")
    oof_s = F.col("__ts__") - F.coalesce(F.col("__s__"), F.lit(0.0))
    pr_c = F.col("__gc__") - F.col("__fc__")
    pr_s = (F.coalesce(F.col("__gs__"), F.lit(0.0))
            - F.col("__fs__"))
    prior = F.when(pr_c > 0, pr_s / pr_c.cast("double"))
    m = F.lit(float(smoothing))
    enc = F.when(oof_c + m > 0,
                 (oof_s + m * F.coalesce(prior, F.lit(0.0)))
                 / (oof_c.cast("double") + m))
    summ = s.select("__cat__", "__fold__", enc.alias(out_col))
    cond = (df[cat_col].eqNullSafe(F.col("__cat__"))
            & fold.eqNullSafe(F.col("__fold__")))
    return (df.join(summ, cond, "left")
            .drop("__cat__", "__fold__"))


def feature_scale(df: DataFrame, cols: list[str],
                  method: str = "zscore",
                  suffix: str = "_scaled",
                  exact: bool = True,
                  accuracy: int = 10000) -> DataFrame:
    """Fit-and-transform feature scaling over numeric columns —
    ``zscore`` ((x-μ)/σ), ``minmax`` ((x-min)/(max-min)), or
    ``robust`` ((x-median)/IQR). Appends ``<col><suffix>`` columns;
    degenerate denominators (constant column) yield NULL, never an
    ANSI error. Beyond-reference: the ML-preprocessing staple a
    feature pipeline needs before k-means/ANN (ref tablite stops at
    per-column statistics, tablite/statistics.py).

    Scale shape: the fit is ONE combinable aggregation over all
    columns at once (1-row result, broadcast back via crossJoin);
    the transform is row-local arithmetic in whole-stage codegen.
    minmax and robust are bit-identical cross-engine (exact extrema
    / percentile_cont interpolation of identical doubles); zscore's
    μ/σ carry summation-order noise, so round zscore outputs at an
    oracle boundary. ``exact=False`` swaps robust's exact percentile
    (whose aggregation buffer holds every value — a single-task
    memory wall past ~10M rows) for the bounded-state
    percentile_approx sketch.
    """
    if method not in ("zscore", "minmax", "robust"):
        raise ValueError(f"unknown scaling method: {method!r}")
    if method == "robust" and exact:
        # r14 optimization round: the exact-percentile fit is the
        # whole cost of this operator (Percentile boxes every value
        # into one task's map — measured 3.2 s of the 3.8 s total on
        # lineitem) AND its single-task buffer is the documented
        # ~10M-row wall. exact_percentiles computes bit-identical
        # values on the census-prefix engine (combinable census, no
        # single-task buffer) and the fit broadcasts as plan
        # literals instead of a crossJoin.
        from tablite_spark.operators.stats import exact_percentiles
        fits = exact_percentiles(df, {c: [0.25, 0.5, 0.75]
                                      for c in cols})
        out = df
        for c in cols:
            trio = fits[c]
            m = trio[1] if trio is not None else None
            s = trio[2] - trio[0] if trio is not None else None
            denom = F.lit(s).cast("double")
            out = out.withColumn(
                c + suffix,
                F.when(denom > 0,
                       (F.col(c) - F.lit(m).cast("double")) / denom)
                .otherwise(F.lit(None)))
        return out
    aggs = []
    for c in cols:
        x = F.col(c)
        if method == "zscore":
            aggs += [F.avg(x).alias(f"__m_{c}__"),
                     F.stddev_pop(x).alias(f"__s_{c}__")]
        elif method == "minmax":
            aggs += [F.min(x).alias(f"__m_{c}__"),
                     (F.max(x) - F.min(x)).alias(f"__s_{c}__")]
        else:
            # exact percentile buffers EVERY value in one aggregation
            # buffer — fine to ~10M rows, the oracle-comparable
            # default; exact=False is the 100 TB valve (bounded
            # KLL/GK-style sketch state, same group_quantiles
            # discipline). ONE array-percentile call per column: a
            # scalar call per quantile pays a separate full buffer
            # each (3x the memory and sort work — the r11 bench
            # caught feature_scale at 6.5 s for this exact reason)
            pct = (F.percentile if exact else
                   lambda col, q: F.percentile_approx(
                       col, q, F.lit(accuracy)))
            trio = pct(x, F.array(F.lit(0.25), F.lit(0.5),
                                  F.lit(0.75)))
            aggs += [trio[1].alias(f"__m_{c}__"),
                     (trio[2] - trio[0]).alias(f"__s_{c}__")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        denom = F.col(f"__s_{c}__")
        out = out.withColumn(
            c + suffix,
            F.when(denom > 0,
                   (F.col(c) - F.col(f"__m_{c}__")) / denom)
            .otherwise(F.lit(None)))
    return out.drop(*[f"__m_{c}__" for c in cols],
                    *[f"__s_{c}__" for c in cols])


def winsorize(df: DataFrame, cols: list[str],
              lower: float = 0.01, upper: float = 0.99,
              suffix: str = "_wins",
              exact: bool = True,
              accuracy: int = 10000) -> DataFrame:
    """Winsorize (clip) numeric columns at the given quantiles — the
    standard outlier-taming step before scaling/regression. Appends
    ``<col><suffix>``. NULLs pass through untouched. Exact
    percentile interpolation makes the clip bounds — and therefore
    every output — bit-identical cross-engine (least/greatest of
    identical doubles; no rounding anywhere); ``exact=False`` is the
    bounded-sketch valve for corpus-scale fits.

    Scale shape: ONE combinable fit aggregation for ALL columns,
    broadcast back as a 1-row crossJoin; the clip is row-local
    codegen (the feature_scale discipline).
    """
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    if exact:
        # census-prefix fit (see feature_scale) — bit-identical clip
        # bounds as plan literals; least/greatest skip NULL bounds,
        # so an empty input degrades to identity exactly as the
        # NULL-stats crossJoin did.
        from tablite_spark.operators.stats import exact_percentiles
        fits = exact_percentiles(df, {c: [lower, upper]
                                      for c in cols})
        out = df
        for c in cols:
            pair = fits[c] if fits[c] is not None else [None, None]
            lo = F.lit(pair[0]).cast("double")
            hi = F.lit(pair[1]).cast("double")
            out = out.withColumn(
                c + suffix,
                F.when(F.col(c).isNotNull(),
                       F.least(F.greatest(F.col(c), lo), hi)))
        return out
    pct = (F.percentile if exact
           else lambda col, q: F.percentile_approx(
               col, q, F.lit(accuracy)))
    aggs = []
    for c in cols:
        x = F.col(c)
        # one buffer per column, not one per quantile
        pair = pct(x, F.array(F.lit(lower), F.lit(upper)))
        aggs += [pair[0].alias(f"__lo_{c}__"),
                 pair[1].alias(f"__hi_{c}__")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        # least/greatest SKIP nulls (both engines), which would turn
        # a NULL cell into the clip bound — guard explicitly
        out = out.withColumn(
            c + suffix,
            F.when(F.col(c).isNotNull(),
                   F.least(F.greatest(F.col(c),
                                      F.col(f"__lo_{c}__")),
                           F.col(f"__hi_{c}__"))))
    return out.drop(*[f"__lo_{c}__" for c in cols],
                    *[f"__hi_{c}__" for c in cols])


def category_index(df: DataFrame, cols: list[str],
                   suffix: str = "_idx") -> DataFrame:
    """Deterministic label indexing (StringIndexer semantics):
    each column's categories map to 0..k−1 ordered by (frequency
    DESC, value ASC) — the most common category gets 0 on every
    engine, every rerun. NULL categories stay NULL. Appends
    ``<col><suffix>``.

    Scale shape: one combinable census per column, index =
    row_number over the VOCAB-BOUNDED census (the bounded-window
    contract), broadcast-join back per column (censuses are
    dictionary-sized; AQE keeps them broadcast).
    """
    from pyspark.sql import Window
    if not cols:
        raise ValueError("category_index requires at least one column")
    out = df
    for c in cols:
        x = F.col(c)
        cens = (df.filter(x.isNotNull())
                .groupBy(x.alias("__v__"))
                .agg(F.count(F.lit(1)).alias("__n__")))
        w = Window.orderBy(F.col("__n__").desc(),
                           F.col("__v__").asc())
        idx = cens.select(
            F.col("__v__"),
            (F.row_number().over(w) - 1).alias(c + suffix))
        out = (out.join(F.broadcast(idx), out[c] == F.col("__v__"),
                        "left")
               .drop("__v__"))
    return out


def quantile_discretize(df: DataFrame, cols: list[str],
                        bins: int = 10, suffix: str = "_bin",
                        exact: bool = True,
                        accuracy: int = 10000) -> DataFrame:
    """Equal-frequency discretization (QuantileDiscretizer
    semantics): each column cuts at its exact quantile edges into at
    most ``bins`` buckets (duplicate edges collapse); appends
    integer ``<col><suffix>`` columns, NULL in → NULL out.

    Scale shape: ONE fit aggregation for ALL columns (array
    percentile — one buffer per column), driver-bounded edge lists
    compiled into row-local bucket expressions (no join at all);
    ``exact=False`` is the bounded-sketch valve.
    """
    from tablite_spark.functions.buckets import bucket_expr
    if bins < 2:
        raise ValueError("bins must be >= 2")
    qs = [i / bins for i in range(1, bins)]
    if exact:
        # census-prefix fit (see feature_scale) — bit-identical edges
        from tablite_spark.operators.stats import exact_percentiles
        vals = exact_percentiles(df, {c: qs for c in cols})
    else:
        aggs = [F.percentile_approx(
            F.col(c), F.array(*[F.lit(q) for q in qs]),
            F.lit(accuracy)).alias(c) for c in cols]
        row = df.agg(*aggs).collect()[0]
        vals = {c: row[c] for c in cols}
    out = df
    for c in cols:
        edges = sorted(set(vals[c])) if vals[c] is not None else []
        out = out.withColumn(
            c + suffix,
            F.when(F.col(c).isNotNull(),
                   bucket_expr(c, edges)).cast("int"))
    return out
