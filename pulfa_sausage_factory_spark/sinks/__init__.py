from pulfa_sausage_factory_spark.sinks import idempotent  # noqa: F401
