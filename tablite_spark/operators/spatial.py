"""Grid-bucketed spatial radius join — the cell-partitioned shape
that replaces a cross join for "all pairs within distance r".

Every point maps to the integer grid cell (x DIV r, y DIV r); a
true match within Euclidean radius r always lands in the SAME cell
or one of its 8 neighbors (|dx| <= r and |dy| <= r bound the cell
offset by 1 on each axis). So the probe side replicates 9x onto its
neighbor cells, the join is a plain equi join on (cell_x, cell_y),
and the exact integer distance filter keeps only true matches.

Scale shape: shuffle volume is |left| + 9|right| rows keyed by
cell — NEVER |left| x |right|. Cell population is bounded by point
density times r^2, independent of corpus size; a hot cell is a data
property (a dense city block), not a plan defect, and AQE's skew
split handles it because this is an ordinary shuffled equi join.
All coordinates and distances are exact BIGINT (squared distance,
never a float sqrt).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(left: DataFrame, right: DataFrame,
                     radius: int,
                     x_col: str = "x", y_col: str = "y",
                     suffixes: tuple[str, str] = ("_l", "_r"),
                     ) -> DataFrame:
    """All (left, right) pairs with squared Euclidean distance
    <= radius^2, via the 9-neighbor cell equi join. ``left`` and
    ``right`` need integer ``x_col`` / ``y_col``; every other
    column is carried through with the side suffix. Output adds
    exact ``dist_sq`` (BIGINT). Null coordinates never match."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    r = int(radius)
    sl, sr = suffixes

    def cells(df: DataFrame, tag: str) -> DataFrame:
        out = df
        for c in df.columns:
            out = out.withColumnRenamed(c, c + tag)
        # integer floor-div grid cell (coordinates may be negative:
        # DIV truncates toward zero, so use floor-division spelled
        # as a shifted DIV-free expression)
        fx = F.floor(F.col(x_col + tag).cast("long") / r)
        fy = F.floor(F.col(y_col + tag).cast("long") / r)
        return (out.filter(F.col(x_col + tag).isNotNull()
                           & F.col(y_col + tag).isNotNull())
                .withColumn("__cx__", fx.cast("long"))
                .withColumn("__cy__", fy.cast("long")))

    lt = cells(left, sl)
    rt = cells(right, sr)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"),
                              F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    rt = (rt.withColumn("__o__", F.explode(offs))
          .withColumn("__cx__", F.col("__cx__") + F.col("__o__.dx"))
          .withColumn("__cy__", F.col("__cy__") + F.col("__o__.dy"))
          .drop("__o__"))
    dx = F.col(x_col + sl).cast("long") - F.col(x_col + sr)
    dy = F.col(y_col + sl).cast("long") - F.col(y_col + sr)
    return (lt.join(rt, ["__cx__", "__cy__"])
            .withColumn("dist_sq", dx * dx + dy * dy)
            .filter(F.col("dist_sq") <= F.lit(r) * F.lit(r))
            .drop("__cx__", "__cy__"))
