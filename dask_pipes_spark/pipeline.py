"""Group P — the pipeline layer: dask-pipes' own abstraction re-expressed
Spark-first (SURVEY.md §2-P, §3.2).

The reference is a pipeline-construction framework over dask.dataframe in the
sklearn style: nodes with ``fit(X) → params`` / ``transform(X) → X'``, wired
into a DAG by named slots, executed in topological order with fitted
parameters persisted between runs.

Spark-first re-expression:
- ``fit`` runs *bounded* aggregations and collects a small param dict to the
  driver (column means, category vocabularies — KBs, never data).
- ``transform`` is 100% lazy DataFrame→DataFrame: params are inlined as
  literals, so the whole fitted pipeline stays one Catalyst plan — codegen'd,
  pushdown-friendly, no Python in the row path (unlike the reference, where
  every node runs interpreted pandas).
- Params persist as JSON (the reference used yaml+parquet) → a fitted
  pipeline can be re-instantiated without refitting.
- ``to_spark_ml()`` bridges to ``pyspark.ml.Pipeline`` for interop.

Determinism: fit params are computed with the decimal-sum formulas from
:mod:`dask_pipes_spark.registry`, so a fitted transform is bit-reproducible
across partitionings — the property p2's SQL oracle checks end-to-end.
"""

from __future__ import annotations

import json
import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Params = dict[str, object]


class Node:
    """A fit/transform pipeline node (reference: ``NodeBase``).

    Subclasses implement ``fit(df) → params`` (bounded driver-side result)
    and ``transform(df, params) → df`` (lazy). A fitted node must behave
    identically when re-created from persisted params.
    """

    name: str = "node"

    def fit(self, df: DataFrame) -> Params:  # pragma: no cover - interface
        return {}

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        raise NotImplementedError


class Pipeline:
    """Ordered DAG of named nodes (a chain — each node consumes its
    predecessor's output, the common dask-pipes topology).

    ``fit_transform`` runs fit-then-transform per node in order, exactly like
    the reference's topological fit pass; ``transform`` replays with stored
    params only. ``save``/``load`` persist the fitted state as JSON.
    """

    def __init__(self, nodes: list[Node]):
        names = [n.name for n in nodes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate node names: {names}")
        self.nodes = nodes
        self.params_: dict[str, Params] = {}

    def fit_transform(self, df: DataFrame) -> DataFrame:
        self.params_ = {}
        for node in self.nodes:
            p = node.fit(df)
            self.params_[node.name] = p
            df = node.transform(df, p)
        return df

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.params_:
            raise RuntimeError("pipeline is not fitted")
        for node in self.nodes:
            df = node.transform(df, self.params_[node.name])
        return df

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.params_, fh, indent=2, sort_keys=True)

    def load(self, path: str) -> "Pipeline":
        with open(path) as fh:
            self.params_ = json.load(fh)
        return self

    def to_spark_ml(self):
        """Interop: wrap the *fitted* pipeline as a pyspark.ml Transformer."""
        from pyspark.ml import Transformer

        outer = self

        class _Wrapped(Transformer):
            def _transform(self, dataset):
                return outer.transform(dataset)

        return _Wrapped()


# --- exact-aggregate helpers (decimal-sum, see registry docstring) -----------

_DEC = "decimal(28,6)"


def _exact_mean_std(df: DataFrame, col: str) -> tuple[float, float]:
    """Exact decimal-sum mean/std. Empty (or single-row) input fits the
    IDENTITY transform (mean 0, std 1): a cold-start pipeline run over an
    empty partition must produce a usable fitted state, not a TypeError —
    scaling then passes values through unchanged, which is the neutral
    choice (asserted in tests/test_pipeline.py)."""
    x = F.col(col)
    row = df.agg(
        F.sum(x.cast(_DEC)).cast("double").alias("sx"),
        F.sum((x * x).cast(_DEC)).cast("double").alias("sxx"),
        F.count(x).alias("n"),
    ).collect()[0]
    if row.n == 0:
        return 0.0, 1.0
    mean = row.sx / row.n
    if row.n == 1:
        return mean, 1.0
    var = (row.sxx - row.sx * row.sx / row.n) / (row.n - 1)
    return mean, math.sqrt(var) if var > 0 else 1.0


# --- concrete nodes (the reference's tabular-preprocessing utility set) ------


class NumericImputer(Node):
    """Fill numeric NAs with fitted column means (reference: NA-filling node)."""

    def __init__(self, cols: list[str], name: str = "impute"):
        self.cols, self.name = cols, name

    def fit(self, df: DataFrame) -> Params:
        return {c: _exact_mean_std(df.filter(F.col(c).isNotNull()), c)[0] for c in self.cols}

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        return df.na.fill({c: params[c] for c in self.cols})


class StandardScaler(Node):
    """z-score numeric columns with fitted mean/std (reference: scaling node)."""

    def __init__(self, cols: list[str], name: str = "scale", round_to: int = 6):
        self.cols, self.name, self.round_to = cols, name, round_to

    def fit(self, df: DataFrame) -> Params:
        return {c: list(_exact_mean_std(df, c)) for c in self.cols}

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        for c in self.cols:
            mean, std = params[c]
            df = df.withColumn(
                f"{c}_z", F.round((F.col(c) - F.lit(mean)) / F.lit(std), self.round_to)
            )
        return df


class CategoryEncoder(Node):
    """Encode a string column as its index in the sorted fitted vocabulary
    (reference: category-encoding node). Unseen values → -1.

    ``max_vocab`` caps the fit-phase ``collect()``: a categorical column is
    assumed driver-collectable (segments, languages, flags — the KB-scale
    vocabulary every encoder ships to executors), but an adversarial or
    miskeyed column (say, a UUID) would otherwise pull the whole table onto
    the driver. Fitting fails fast with a clear error instead."""

    def __init__(self, col: str, name: str = "encode", max_vocab: int = 10_000):
        self.col, self.name, self.max_vocab = col, name, max_vocab

    def fit(self, df: DataFrame) -> Params:
        # limit(max+1): bounded driver transfer even when the column is
        # high-cardinality — we only need to know the cap was exceeded
        probe = (
            df.select(self.col).distinct().orderBy(self.col).limit(self.max_vocab + 1)
        )
        vals = [r[0] for r in probe.collect()]
        if len(vals) > self.max_vocab:
            raise ValueError(
                f"CategoryEncoder({self.col!r}): distinct count exceeds "
                f"max_vocab={self.max_vocab}; this column is not a "
                "bounded categorical — raise max_vocab explicitly or hash-"
                "encode instead"
            )
        return {"vocab": vals}

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        vocab: list[str] = params["vocab"]  # type: ignore[assignment]
        if not vocab:
            # empty fitted vocabulary (cold-start fit on an empty frame):
            # every value is unseen → the unseen code, not a VOID-typed map
            return df.withColumn(f"{self.col}_code", F.lit(-1).cast("int"))
        mapping = F.create_map(
            *[x for i, v in enumerate(vocab) for x in (F.lit(v), F.lit(i))]
        )
        return df.withColumn(
            f"{self.col}_code",
            F.coalesce(mapping[F.col(self.col)], F.lit(-1)).cast("int"),
        )


class DateExpander(Node):
    """Expand a timestamp column into calendar parts (reference: datetime
    handling node). Stateless — fit is a no-op."""

    def __init__(self, col: str, name: str = "dates"):
        self.col, self.name = col, name

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        c = F.col(self.col)
        return (
            df.withColumn(f"{self.col}_year", F.year(c))
            .withColumn(f"{self.col}_month", F.month(c))
            .withColumn(f"{self.col}_dow", F.dayofweek(c))
        )


class FnNode(Node):
    """Ad-hoc stateless node from a plain function (reference: custom nodes)."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str = "fn"):
        self.fn, self.name = fn, name

    def transform(self, df: DataFrame, params: Params) -> DataFrame:
        return self.fn(df)


class DagNode:
    """A named vertex in a :class:`DagPipeline`: ``inputs`` are the names of
    upstream nodes (or pipeline input slots) whose OUTPUT DataFrames feed
    this node, in declaration order — the reference's named input/output
    slot wiring. ``fit`` receives the input frames and returns a JSON-able
    param dict; ``transform`` receives them plus the params and returns one
    DataFrame."""

    def __init__(self, name: str, inputs: list[str]):
        self.name = name
        self.inputs = list(inputs)

    def fit(self, dfs: list[DataFrame]) -> Params:
        return {}

    def transform(self, dfs: list[DataFrame], params: Params) -> DataFrame:
        raise NotImplementedError


class DagFn(DagNode):
    """Stateless DAG vertex from a plain function ``fn(*dfs) -> DataFrame``."""

    def __init__(self, name: str, inputs: list[str], fn):
        super().__init__(name, inputs)
        self._fn = fn

    def transform(self, dfs: list[DataFrame], params: Params) -> DataFrame:
        return self._fn(*dfs)


class DagPipeline:
    """General DAG of named fit/transform nodes — the reference's Graph /
    vertex / edge layer: nodes are wired by NAME (multi-input joins, shared
    branches), validated acyclic, executed in topological order with each
    output computed once and fanned out to every consumer.

    Everything stays lazy: a "run" wires Catalyst plans together, so a
    diamond DAG compiles into ONE Spark plan with the shared branch reused,
    not re-executed per consumer (at 100 TB, persist() a branch explicitly
    when its recompute cost exceeds its cache cost — SURVEY §3.3).

    ``fit_transform(inputs)`` runs fit-then-transform per node (the
    reference's fit pass); ``transform`` replays with stored params.
    ``outputs`` names the sink node(s); single-sink DAGs return the frame.
    """

    def __init__(self, nodes: list[DagNode], outputs: list[str]):
        names = [n.name for n in nodes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate node names: {names}")
        self.nodes = {n.name: n for n in nodes}
        self.outputs = list(outputs)
        self.order = self._toposort(nodes)
        self.params_: dict[str, Params] = {}

    def _toposort(self, nodes: list[DagNode]) -> list[str]:
        known = set(self.nodes)
        done: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in seen or name not in known:
                return  # unknown names are pipeline input slots
            if name in visiting:
                raise ValueError(f"cycle through node '{name}'")
            visiting.add(name)
            for up in self.nodes[name].inputs:
                visit(up)
            visiting.discard(name)
            seen.add(name)
            done.append(name)

        for n in nodes:
            visit(n.name)
        return done

    def _run(self, inputs: dict[str, DataFrame], fit: bool) -> dict[str, DataFrame]:
        frames = dict(inputs)
        for name in self.order:
            node = self.nodes[name]
            missing = [i for i in node.inputs if i not in frames]
            if missing:
                raise ValueError(f"node '{name}' missing inputs {missing}")
            dfs = [frames[i] for i in node.inputs]
            if fit:
                self.params_[name] = node.fit(dfs)
            frames[name] = node.transform(dfs, self.params_.get(name, {}))
        return frames

    def fit_transform(self, inputs: dict[str, DataFrame]):
        self.params_ = {}
        frames = self._run(inputs, fit=True)
        outs = [frames[o] for o in self.outputs]
        return outs[0] if len(outs) == 1 else outs

    def transform(self, inputs: dict[str, DataFrame]):
        frames = self._run(inputs, fit=False)
        outs = [frames[o] for o in self.outputs]
        return outs[0] if len(outs) == 1 else outs


def _dag_save(self: "DagPipeline", path: str) -> None:
    """Persist fitted per-node params as JSON (the reference persists each
    node's fitted state between runs; topology stays in code)."""
    with open(path, "w") as fh:
        json.dump(self.params_, fh, indent=2, sort_keys=True)


def _dag_load(self: "DagPipeline", path: str) -> "DagPipeline":
    with open(path) as fh:
        self.params_ = json.load(fh)
    return self


DagPipeline.save = _dag_save
DagPipeline.load = _dag_load
