from etl_seattle_call_data_spark.plans.queries import REGISTRY, EngineQuery  # noqa: F401
