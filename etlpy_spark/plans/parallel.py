"""Explicit map/reduce split of a pipeline at its ToListTF boundary.

The reference's distribution model (reference etl.py:919-935
``parallel_map`` / ``parallel_reduce``, driven by the master/slave
dispatcher in distributed.py): a module is split at the first ``ToListTF``
stage — the PREFIX runs once to enumerate seeds; the SUFFIX runs per seed
slice on each worker.

Spark-first re-expression: the prefix compiles to a seed DataFrame; the
"per-seed fan-out" is a repartition of that DataFrame (each partition is a
worker's slice) and the suffix compiles ONTO the repartitioned plan — one
job, no driver-side seed materialization, work distribution handled by the
scheduler. ``parallel_execute`` is the mThreadExecute/master-slave
equivalent (reference etl.py:938-982) as a single composed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etlpy_spark.plans.compiler import CompileContext, compile_stages
from etlpy_spark.plans.spec import EtlModule, Stage


def split_at_tolist(stages: list[Stage]) -> tuple[list[Stage], list[Stage]]:
    """(prefix, suffix) around the first ToListTF. No ToListTF → the
    reference treats stage 0 as the whole map side (etl.py:922-927)."""
    idx = next((i for i, s in enumerate(stages) if s.type == "ToListTF"), -1)
    if idx == -1:
        return stages[:1], stages[1:]
    return stages[:idx], stages[idx + 1 :]


def _stages(ctx: CompileContext, module: str | list[Stage]) -> list[Stage]:
    if isinstance(module, str):
        mod = ctx.project.module(module)
        if not isinstance(mod, EtlModule):
            raise TypeError(f"module {module!r} is not an ETL pipeline")
        return mod.stages
    return module


def parallel_map(ctx: CompileContext, module: str | list[Stage]) -> DataFrame:
    """Compile the seed-enumeration prefix (run once, reference
    etl.py:919-927)."""
    prefix, _ = split_at_tolist(_stages(ctx, module))
    return compile_stages(ctx, prefix, None)


def parallel_reduce(
    ctx: CompileContext,
    module: str | list[Stage],
    seeds: DataFrame,
    partitions: int | None = None,
) -> DataFrame:
    """Compile the per-seed suffix over a seed DataFrame (reference
    etl.py:929-935): repartition = hand each worker its slice."""
    _, suffix = split_at_tolist(_stages(ctx, module))
    fanned = seeds.repartition(partitions or ctx.parallelism)
    return compile_stages(ctx, suffix, fanned)


def parallel_execute(
    ctx: CompileContext, module: str | list[Stage], partitions: int | None = None
) -> DataFrame:
    """prefix-once → fan out → suffix-per-slice, as one composed plan
    (reference mThreadExecute etl.py:938-982)."""
    return parallel_reduce(ctx, module, parallel_map(ctx, module), partitions)
