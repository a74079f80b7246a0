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
    # local-mode executors need the package importable (cluster: --py-files)
    repo = os.path.dirname(os.path.abspath(__file__))
    pypath = os.environ.get("PYTHONPATH", "")
    if repo not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo + (os.pathsep + pypath if pypath else "")

    from otlp_wire_spark.queries import q_wire_band_histogram

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
