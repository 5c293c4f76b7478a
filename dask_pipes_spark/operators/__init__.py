"""Operator groups (SURVEY.md §2). Importing this package registers every
operator into :mod:`dask_pipes_spark.registry`."""

from dask_pipes_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    curation,
    functions_ops,
    joins,
    llm_ext,
    llm_ops,
    multimodal,
    projection,
    scans,
    pipeline_ops,
    setops,
    sketches,
    sorts,
    streaming_ops,
    udfs,
    vectors,
    windows,
)

__all__ = [
    "aggregates",
    "analytics",
    "curation",
    "functions_ops",
    "joins",
    "llm_ext",
    "llm_ops",
    "multimodal",
    "projection",
    "scans",
    "pipeline_ops",
    "setops",
    "sketches",
    "sorts",
    "streaming_ops",
    "udfs",
    "vectors",
    "windows",
]
