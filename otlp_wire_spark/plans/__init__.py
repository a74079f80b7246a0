from otlp_wire_spark.plans.asserts import (  # noqa: F401
    executed_plan,
    assert_arrow_only,
    assert_broadcast_join,
    assert_no_python,
    assert_pushed_filter,
)
