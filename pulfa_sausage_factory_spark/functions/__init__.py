from pulfa_sausage_factory_spark.functions import scalars, text, vectors  # noqa: F401
