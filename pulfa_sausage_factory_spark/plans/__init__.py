from pulfa_sausage_factory_spark.plans.audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_pruned,
    explain_formatted,
)
from pulfa_sausage_factory_spark.plans.audit import assert_no_exchange  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import assert_take_ordered  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import assert_partition_pruned  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import count_exchanges  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import assert_max_exchanges  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import assert_scan_streams_into_broadcast_join  # noqa: F401,E402
from pulfa_sausage_factory_spark.plans.audit import assert_no_pre_join_aggregate  # noqa: F401,E402
