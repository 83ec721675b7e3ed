"""PipelineSpec → DataFrame compiler.

The reference folds its tool list into one nested Python generator
(reference etl.py:907-917 ``generate``) — a serial, pull-based Volcano chain
whose row *order* is semantically load-bearing (AutoIndexTF counters,
zip-merge, offset/limit, dedup-keep-first). We reproduce those semantics in
a distributed plan by threading a hidden lexicographic order vector
``__ord__: array<bigint>`` through the plan:

  - every source stage emits ``__ord__ = [i]`` (its generation index),
  - ``Append`` prefixes a branch tag (left=0/right=1) so concatenation order
    survives a union of arbitrarily-partitioned inputs,
  - lateral ``Cross`` appends the child position,
  - zip-``Merge`` joins on per-side row_number over ``__ord__``.

Order-insensitive pipelines never sort: ``__ord__`` is just a column, and if
no stage consumes it Catalyst prunes the whole lineage. Order-sensitive
stages (AutoIndexTF / RangeTF / zip) each cost one global sort — exactly the
operations that are inherently order-global on any engine.

Executors (sinks) are collected, not run, unless ``execute=True`` —
mirroring the reference's dry-run mode (etl.py:913-914).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etlpy_spark.plans.spec import CrawlerSpec, EtlModule, ProjectSpec, Stage

ORD = "__ord__"
_RN = "__rn__"

_REGISTRY: dict[str, Callable[["CompileContext", DataFrame | None, Stage], DataFrame]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def registered_ops() -> list[str]:
    return sorted(_REGISTRY)


@dataclass
class CompileContext:
    spark: SparkSession
    project: ProjectSpec | None = None
    tables: dict[str, DataFrame] = field(default_factory=dict)
    # fetcher: CrawlerSpec -> (list[str] -> list[list[dict[str,str]]])
    fetcher: Callable[[CrawlerSpec], Callable] | None = None
    files_root: str = "."
    execute: bool = False
    parallelism: int = 8
    sinks: list[tuple[str, Callable[[DataFrame], None]]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# order-vector helpers


def with_ord(df: DataFrame, idx) -> DataFrame:
    return df.withColumn(ORD, F.array(F.col(idx).cast("long") if isinstance(idx, str) else idx.cast("long")))


def ord_append(a: DataFrame, b: DataFrame) -> DataFrame:
    """Append = UNION ALL with preserved concatenation order
    (reference extends.py:87-91 ``Append``)."""
    a2 = a.withColumn(ORD, F.concat(F.array(F.lit(0).cast("long")), F.col(ORD)))
    b2 = b.withColumn(ORD, F.concat(F.array(F.lit(1).cast("long")), F.col(ORD)))
    return a2.unionByName(b2, allowMissingColumns=True)


def zip_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Positional zip of two streams, right columns override left, length =
    min (reference extends.py:75-84 ``MergeAll`` — the *intended* semantics
    of Generator MergeType='Merge'; the reference's dispatch at etl.py:121
    calls the dict-merge by mistake and crashes on generators).

    Positional join is inherently order-global; one row_number per side.
    """
    wa = Window.orderBy(F.col(ORD))
    a2 = a.withColumn(_RN, F.row_number().over(wa))
    b2 = b.withColumn(_RN, F.row_number().over(wa))
    override = [c for c in a2.columns if c in b2.columns and c not in (_RN, ORD)]
    a2 = a2.drop(*override)
    out = a2.join(b2.drop(ORD), on=_RN, how="inner")
    return out.withColumn(ORD, F.array(F.col(_RN).cast("long"))).drop(_RN)


def ord_cross(a: DataFrame, b: DataFrame) -> DataFrame:
    """Uncorrelated cross: for each left row the whole right stream, right
    columns override left (reference extends.py:66-73 ``Cross``)."""
    override = [c for c in a.columns if c in b.columns and c != ORD]
    a2 = a.drop(*override)
    b2 = b.withColumnRenamed(ORD, "__ord_r__")
    out = a2.crossJoin(b2)
    return out.withColumn(ORD, F.concat(F.col(ORD), F.col("__ord_r__"))).drop("__ord_r__")


def apply_generator(
    ctx: CompileContext,
    df: DataFrame | None,
    st: Stage,
    make_source: Callable[[], DataFrame],
    make_lateral: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Shared Generator composition semantics (reference etl.py:114-123)."""
    if df is None:
        return make_source()
    mt = st.get("MergeType", "Append")
    if mt == "Append":
        return ord_append(df, make_source())
    if mt == "Merge":
        return zip_merge(df, make_source())
    if make_lateral is not None:
        return make_lateral(df)
    return ord_cross(df, make_source())


def seq_over_ord(df: DataFrame) -> Any:
    return F.row_number().over(Window.orderBy(F.col(ORD)))


# ---------------------------------------------------------------------------
# compile entry points


def compile_stages(
    ctx: CompileContext, stages: list[Stage], df: DataFrame | None = None
) -> DataFrame | None:
    import etlpy_spark.operators.core  # noqa: F401  (registers builders)
    import etlpy_spark.operators.complexops  # noqa: F401

    for st in stages:
        if not st.enabled:
            continue  # reference etl.py:910-911
        builder = _REGISTRY.get(st.type)
        if builder is None:
            raise NotImplementedError(f"no builder registered for stage type {st.type!r}")
        df = builder(ctx, df, st)
    return df


def compile_module(ctx: CompileContext, name: str) -> DataFrame | None:
    mod = ctx.project.module(name)
    if not isinstance(mod, EtlModule):
        raise TypeError(f"module {name!r} is a crawler, not an ETL pipeline")
    return compile_stages(ctx, mod.stages, None)


def finalize(df: DataFrame, ordered: bool = False) -> DataFrame:
    """Strip the internal order vector; optionally materialize stream order."""
    if ORD in df.columns:
        if ordered:
            df = df.orderBy(F.col(ORD))
        df = df.drop(ORD)
    return df


def run_module(
    ctx: CompileContext, name: str, execute: bool = True, ordered: bool = False
) -> DataFrame | None:
    """Compile + run sinks (reference ``generate(..., execute=True)``)."""
    ctx.execute = execute
    ctx.sinks.clear()
    df = compile_module(ctx, name)
    out = finalize(df, ordered=ordered) if df is not None else None
    if execute:
        for _, sink in ctx.sinks:
            sink(out)
    return out
