"""Bloom-prefiltered semi join — the big-probe-side shuffle reducer.

``lineitem SEMI JOIN orders-subset`` at 100 TB shuffles every probe
row to the join even when the build side keeps 1% of keys. The
standard fix (what Spark's own runtime row-level filters do for
AQE-eligible plans, generalized here to any build side you can
aggregate): hash the build side's DISTINCT keys into an m-bit Bloom
bitmap, broadcast the raw bits (~10x smaller than a broadcast-join
hash table for the same key count), and drop probe rows map-side
BEFORE the exact join. False positives (~0.1% at 12 bits/key, 7
hashes) are removed by the exact confirm join; false negatives are
impossible, so the output is IDENTICAL to the plain semi join — the
Bloom pass only moves work from the shuffle to a vectorized
map-side filter.

This is the key-column twin of ``pipeline/text.py:
bloom_decontaminate`` (same Kirsch-Mitzenmacher double hashing over
one xxhash64, same numpy bitmap), reusable for any big ⋈ selective-
dim reduction.
"""
# NOTE: no ``from __future__ import annotations`` here — pandas_udf
# resolves the worker function's type hints via the MODULE globals,
# so the ``pd.Series`` annotations below must be evaluatable at
# decoration time (the future-import + function-local pandas import
# combination raises UNSUPPORTED_SIGNATURE on Spark 4).
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_semi_join(big: DataFrame, small: DataFrame,
                    big_key: str, small_key: str,
                    bits_per_key: int = 12,
                    num_hashes: int = 7) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` appears in ``small``'s
    ``small_key`` — exactly ``big.join(small, ..., 'left_semi')``,
    with the probe side pre-filtered through a broadcast Bloom
    bitmap built from the build side's distinct keys. The build
    side must be the selective one (its distinct keys drive bitmap
    size and the driver collect)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    keys = (small.filter(F.col(small_key).isNotNull())
            .select(F.xxhash64(F.col(small_key)).alias("kh"))
            .distinct())
    karr = keys.toPandas()["kh"].to_numpy().astype(np.uint64)
    m = 64
    while m < max(len(karr), 1) * bits_per_key:
        m <<= 1
    mask = np.uint64(m - 1)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1, h2 = karr & mask, (karr >> np.uint64(33)) | np.uint64(1)
    for i in range(num_hashes):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    bc = big.sparkSession.sparkContext.broadcast(bits.tobytes())
    k = num_hashes

    @pandas_udf("boolean")
    def _maybe(kh: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        hv = kh.to_numpy().astype(np.uint64)
        f1, f2 = hv & mask, (hv >> np.uint64(33)) | np.uint64(1)
        keep = np.ones(len(hv), dtype=bool)
        for i in range(k):
            pos = (f1 + np.uint64(i) * f2) & mask
            keep &= (bm[(pos >> np.uint64(3)).astype(np.int64)]
                     >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return pd.Series(keep)

    pre = big.filter(F.col(big_key).isNotNull()) \
             .filter(_maybe(F.xxhash64(F.col(big_key))))
    return pre.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        big_key, "left_semi")
