from pulfa_sausage_factory_spark.streaming import incremental, windows  # noqa: F401
