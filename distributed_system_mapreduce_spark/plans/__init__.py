from distributed_system_mapreduce_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    global_ordered_windows,
    plan_has,
    plan_lacks,
)
