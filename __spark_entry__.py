"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-point dhdt-style linear
regression, SURVEY §2.4 A2) on sf0.001; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with its DuckDB
oracle (see deepicedrain_spark/suite.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepicedrain_spark import suite  # noqa: E402
from deepicedrain_spark import suite_custom  # noqa: E402,F401  (registers queries)
from deepicedrain_spark import suite_llm  # noqa: E402,F401  (registers queries)
from deepicedrain_spark import suite_retrieval  # noqa: E402,F401  (registers queries)
from deepicedrain_spark import suite_sketch  # noqa: E402,F401  (registers queries)
from deepicedrain_spark import suite_streaming  # noqa: E402,F401  (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.q_dhdt_regression(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
