from otlp_wire_spark.fixtures.pages import (  # noqa: F401
    generate_pages,
    generate_lookup,
    LANG_POOL,
    NUM_SHARDS_DEFAULT,
)
from otlp_wire_spark.fixtures import oracle  # noqa: F401
