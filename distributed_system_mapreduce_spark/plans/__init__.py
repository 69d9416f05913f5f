from distributed_system_mapreduce_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    plan_has,
    plan_lacks,
)
