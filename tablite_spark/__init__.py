"""tablite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of root-11/tablite, re-expressed as
declarative Spark plans (DataFrame/SQL, Catalyst-optimized), plus the
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal columns) the reference never had.

Quick start::

    from tablite_spark import Table, GroupBy, get_spark
    spark = get_spark()
    t = Table.from_file(spark, "data.csv")
    pass_t, fail_t = t.filter([{"column1": "a", "criteria": ">=", "value2": 3}])
    g = t.groupby(["k"], [("v", GroupBy.sum)])
"""

from tablite_spark.session import get_spark, load_tables  # noqa: F401
from tablite_spark.table import Table, GroupBy  # noqa: F401
from tablite_spark.config import Config  # noqa: F401
from tablite_spark.datasets import synthetic_order_data  # noqa: F401
from tablite_spark.sources.io import get_headers  # noqa: F401

__version__ = "0.1.0"
