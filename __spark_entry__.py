"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship severity-band pipeline query on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with DuckDB-oracle SQL (see otlp_wire_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build pages from documents,
    run the REAL Arrow parse UDF, classify severity bands, count."""
    from otlp_wire_spark.queries import q_wire_band_histogram
    from otlp_wire_spark.shipping import ensure_session_ready

    ensure_session_ready(spark)  # ANSI conf + ship package to workers

    return q_wire_band_histogram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from otlp_wire_spark.queries import QUERIES
    from otlp_wire_spark.queries_ext import QUERIES_EXT
    from otlp_wire_spark.queries_wire import QUERIES_WIRE

    return {**QUERIES, **QUERIES_EXT, **QUERIES_WIRE}


def oracle_sql() -> dict[str, str]:
    from otlp_wire_spark.queries import ORACLES
    from otlp_wire_spark.queries_ext import ORACLES_EXT
    from otlp_wire_spark.queries_wire import ORACLES_WIRE

    return {**ORACLES, **ORACLES_EXT, **ORACLES_WIRE}
