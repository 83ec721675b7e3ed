"""Training-data sampling/packing operators.

Scale shapes:
  - stratified_sample: hash-gate per row (xxhash64 of the id + seed) —
    NO randomness state, NO shuffle, fully deterministic and stable
    under retries/re-partitioning (F.rand() is neither: it reseeds per
    partition, so a lost executor resamples differently). Per-stratum
    rates ride a broadcast map.
  - pack_sequences: first-fit-decreasing-ish packing of documents into
    fixed token-budget bins (context windows). Global greedy packing is
    inherently serial, so the scale shape is: range-partition by the
    sort key, pack greedily WITHIN each partition (applyInPandas), and
    make bin ids globally unique via the partition id — bin quality is
    within-partition optimal, coordination cost zero, which is how
    production packers work at corpus scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash-gate resolution: rates are exact to 1/2^20
_GATE = 1 << 20


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``pmod(xxhash64(id, seed), 2^20) < fraction(stratum) * 2^20``.

    Unlike ``df.sampleBy`` (rand-based, partition-order dependent), the
    keep decision is a pure function of (id, seed) — re-running on
    different cluster sizes, partitionings or retry schedules yields the
    SAME sample, which is what makes a 100 TB data recipe reproducible.
    ``fractions``: stratum value -> keep fraction in [0, 1]; unlisted
    strata use ``default_fraction``."""
    mapping = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    frac = F.coalesce(
        mapping.getItem(F.col(strata_col)), F.lit(float(default_fraction))
    )
    gate = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_GATE))
    return df.filter(gate < (frac * _GATE).cast("long"))


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    npart: int | None = None,
) -> DataFrame:
    """Pack documents into bins of at most ``budget`` tokens (context-
    window packing for LLM training). Adds ``bin_id`` (globally unique)
    and ``bin_fill`` (the bin's total tokens).

    Rows are range-partitioned by descending token count (big docs
    first — the FFD heuristic), then each partition packs greedily into
    open bins via a vectorized first-fit pass. Documents longer than the
    budget get a singleton bin (truncation is the caller's policy).
    Packing quality is within-partition FFD; cross-partition coordination
    is zero, so the op scales linearly with partitions."""
    spark = df.sparkSession
    if npart is None:
        npart = spark.sparkContext.defaultParallelism

    src = df.select(
        F.col(id_col).alias("__id__"),
        F.col(token_col).cast("long").alias("__tok__"),
    ).repartitionByRange(npart, F.col("__tok__").desc(), F.col("__id__"))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part = TaskContext.get().partitionId() if TaskContext.get() else 0
        # first-fit over open bins; bins list stays short because input
        # arrives big-first (FFD) — complexity ~O(n * open_bins)
        fills: list[int] = []
        assign: dict[int, list[int]] = {}
        ids_all, toks_all = [], []
        for pdf in batches:
            ids_all.extend(pdf["__id__"].tolist())
            toks_all.extend(pdf["__tok__"].tolist())
        order = sorted(range(len(ids_all)), key=lambda i: (-toks_all[i], ids_all[i]))
        out_bin = [0] * len(ids_all)
        for i in order:
            t = toks_all[i]
            placed = None
            for b, fl in enumerate(fills):
                if fl + t <= budget:
                    placed = b
                    break
            if placed is None:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += t
            out_bin[i] = placed
            assign.setdefault(placed, []).append(i)
        yield pd.DataFrame(
            {
                "__id__": ids_all,
                "__tok__": toks_all,
                # globally unique: (partition id, local bin index)
                "bin_id": [part * (1 << 32) + b for b in out_bin],
                "bin_fill": [fills[b] for b in out_bin],
            }
        )

    id_ddl = df.schema[id_col].dataType.simpleString()
    packed = src.mapInPandas(
        pack, schema=f"__id__ {id_ddl}, __tok__ long, bin_id long, bin_fill long"
    )
    return (
        df.join(
            packed.select(
                F.col("__id__").alias(id_col), "bin_id", "bin_fill"
            ),
            on=id_col,
        )
    )
