"""Operator registry — the bridge between SURVEY.md §2 and ``__spark_entry__``.

Every operator in the engine registers itself here with its §2 key, a
callable ``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the
equivalent DuckDB oracle SQL. The driver's correctness gate compares the two
at sf=0.01 (row-count + schema + order-insensitive value-hash).

Hash-stability conventions (SURVEY.md §7.6, binding for every registered op):

- Alias every computed column identically on both sides.
- Float aggregates use the *decimal-sum* pattern (:data:`DSUM`): cast to
  DECIMAL before SUM so the aggregation is exact and associative — bitwise
  identical on Spark and DuckDB regardless of partitioning/order — then cast
  back to DOUBLE. Derived stats (avg/var/corr) are built from decimal sums
  with plain double arithmetic, which IEEE-deterministically matches.
- No bare ``dropDuplicates``/unordered ``first``/``collect_list`` in any
  SQL-oracled query; top-k always rides a total-order sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator under its SURVEY §2 key.

    ``oracle=None`` declares a weak (rows-only) check — reserved for
    non-SQL-expressible / nondeterministic operators (sketches, RNG,
    streaming runtime, LSH, filesystem writes).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


# --- hash-stable float aggregate helpers (used across operator groups) ------

#: Decimal type wide enough for any fixture sum (values ≤ ~1e6, ≤ 1e6 rows).
_DEC = "decimal(28,6)"


def dsum(col: str | Column) -> Column:
    """Exact, order-insensitive SUM of a double column, returned as double.

    ``SUM(CAST(x AS DECIMAL(28,6)))`` is exact integer arithmetic under the
    hood, so Spark's partial/final aggregation order cannot perturb the
    result; DuckDB computes the identical value. SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """Hash-stable AVG: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"
