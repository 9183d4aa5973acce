"""Synthetic dataset generator — the reference's benchmark table
(tablite/datasets.py:9-84 ``synthetic_order_data``), generated
DISTRIBUTED: ``spark.range`` + seeded JVM-side expressions, no driver
loop, no python in the row path. 50M rows is a ~1-second plan; cost is
all in the sink.

Column shape matches the reference (names, types, value ranges):
``#`` row number, ``1`` order id (big int), ``2`` delivery datetime,
``3`` store id 50000-51000, ``4`` bit, ``5`` product id 3000-30000,
``6`` "C{1-5}-{1-5}", ``7`` three uppercase letters, ``8`` temperature
group incl. literal "None", ``9`` category incl. empty string, ``10``
uniform float, ``11`` uniform float rendered as string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_L1 = ["None", "0°", "6°", "21°"]
_L2 = ["ABC", "XYZ", ""]


def synthetic_order_data(spark: SparkSession, rows: int = 100_000,
                         seed: int = 42) -> DataFrame:
    df = spark.range(1, rows + 1).select(F.col("id").alias("#"))

    def rnd(i: int):
        return F.rand(seed + i)

    def randint(i: int, lo: int, hi: int):
        return (F.floor(rnd(i) * ((hi - lo) + 1)) + lo).cast("long")

    def letter(i: int):
        return F.char(F.lit(65) + F.floor(rnd(i) * 26).cast("int"))

    def choice(i: int, values: list[str]):
        return F.element_at(F.array(*[F.lit(v) for v in values]),
                            (F.floor(rnd(i) * len(values)) + 1).cast("int"))

    # reference ordinal range 738000..738150 = 2021-07-29..2021-12-26
    return df.select(
        "#",
        randint(1, 18_778_628_504, 2_277_772_117_504).alias("1"),
        F.to_timestamp(F.date_add(F.to_date(F.lit("2021-07-29")),
                                  randint(2, 0, 150).cast("int"))).alias("2"),
        randint(3, 50_000, 51_000).alias("3"),
        randint(4, 0, 1).alias("4"),
        randint(5, 3_000, 30_000).alias("5"),
        F.concat(F.lit("C"), randint(6, 1, 5).cast("string"), F.lit("-"),
                 randint(7, 1, 5).cast("string")).alias("6"),
        F.concat(letter(8), letter(9), letter(10)).alias("7"),
        choice(11, _L1).alias("8"),
        choice(12, _L2).alias("9"),
        (rnd(13) * (2.5 - 0.01) + 0.01).alias("10"),
        (rnd(14) * (25.0 - 0.1) + 0.1).cast("string").alias("11"),
    )
