from pulfa_sausage_factory_spark.pipelines import ead_pipeline  # noqa: F401
