from pulfa_sausage_factory_spark.operators import (  # noqa: F401
    dedup,
    events,
    relational,
    similarity,
)
