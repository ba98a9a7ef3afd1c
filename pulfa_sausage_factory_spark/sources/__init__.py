from pulfa_sausage_factory_spark.sources import (  # noqa: F401
    listing,
    report_codec,
    sqlite_queue,
    xml_codec,
)
