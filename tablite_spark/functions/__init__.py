from tablite_spark.functions.rounding import xround  # noqa: F401
from tablite_spark.functions.inference import guess_types  # noqa: F401
