from pulfa_sausage_factory_spark.operators import (  # noqa: F401
    ann_index,
    dedup,
    events,
    relational,
    similarity,
)
