"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in the ``dask_pipes_spark`` package; this module is a
thin adapter over its registry (SURVEY.md §2 keys).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY §2 `d3`) on sf0.001."""
    from dask_pipes_spark import operators  # noqa: F401 — registers operators
    from dask_pipes_spark.registry import QUERIES

    return QUERIES["d3_groupby_multi"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dask_pipes_spark import operators  # noqa: F401 — registers operators
    from dask_pipes_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-checkable key in ``queries()``."""
    from dask_pipes_spark import operators  # noqa: F401 — registers operators
    from dask_pipes_spark.registry import ORACLES

    return dict(ORACLES)
