from pulfa_sausage_factory_spark.functions import (  # noqa: F401
    lm,
    profiling,
    sampling,
    scalars,
    skew,
    text,
    vectors,
)
