from tablite_spark.streaming.ops import (  # noqa: F401
    stream_from_directory, tumbling_counts, session_aggregate,
    stateful_running_total,
)
