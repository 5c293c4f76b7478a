"""Operator groups (SURVEY.md §2). Importing this package registers every
operator into :mod:`dask_pipes_spark.registry`."""

from dask_pipes_spark.operators import aggregates  # noqa: F401

__all__ = ["aggregates"]
