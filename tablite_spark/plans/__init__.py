from tablite_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    codegen_stage_count,
    plan_report,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
