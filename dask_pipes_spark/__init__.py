"""dask_pipes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``artefom/dask-pipes`` (Dask DataFrame API
parity), re-expressed Spark-first.

The reference checkout is empty (see SURVEY.md §0); the capability contract is
SURVEY.md §2's 78-key operator inventory. Every operator here is declared via
the registry in :mod:`dask_pipes_spark.registry` and is checked against a
DuckDB SQL oracle by the driver (``__spark_entry__.py``).

Architecture: DataFrame/SQL-first — Catalyst/AQE does the optimizing; Pandas
UDFs only where built-in operators can't express the semantics (SURVEY §4.2).
"""

from dask_pipes_spark.session import get_session, configure_session, load_tables
from dask_pipes_spark.registry import QUERIES, ORACLES, query

__all__ = [
    "get_session",
    "configure_session",
    "load_tables",
    "QUERIES",
    "ORACLES",
    "query",
]

__version__ = "0.1.0"
