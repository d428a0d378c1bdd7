"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Stage-1+2 KG extraction over pages
synthesized from the sf0.001 documents table. ``queries()`` /
``oracle_sql()`` expose the operator inventory from SURVEY.md §2 (see
clip_retrieval_spark.entry_queries for the implementations and the
cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clip_retrieval_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: triple extraction (Stages 1+2) over pages built
    from /root/testdata/sf0.001 documents."""
    from clip_retrieval_spark.entry_queries import kg_triples

    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None
    }
