from pulfa_sausage_factory_spark.plans.audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_pruned,
    explain_formatted,
)
