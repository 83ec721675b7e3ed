"""Watermarked windowed aggregation and custom stateful operators over
the crawl's streamed output tables.

`incremental.stream_snapshot_table` turns an append-only crawl table
into a Structured Streaming source; this module is the consumer-side
toolbox on top of it:

- :func:`crawl_log_event_time` — deterministic event time. The engine is
  wall-clock-free on purpose (bitwise reproducibility), so event time is
  DERIVED from ``fetch_seq``, the crawl's monotone logical clock: row i
  fetched at ``origin + i seconds``. Same rows → same timestamps on any
  cluster, any retry schedule.
- :func:`windowed_fetch_counts` — per-host tumbling-window counts with a
  watermark: the standard late-data pattern (watermark bounds state; a
  row later than the bound is dropped rather than growing state forever).
  Built-in exprs only — JVM-side streaming aggregation with partial
  (map-side) combine, the same shape at 100 TB.
- :func:`running_host_totals` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: per-host cumulative fetch totals carried
  across micro-batches in the state store, surviving stream restarts
  from the checkpoint. The state per group is one int — O(hosts) state,
  the only shape that holds at 10^10 URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RUNNING_DDL = "host string, total long, batch_rows long"
_STATE_DDL = "total long"


def crawl_log_event_time(df: DataFrame, origin: str = "2026-01-01 00:00:00",
                         per_sec: int = 1) -> DataFrame:
    """Add ``host`` and a deterministic ``event_ts`` (origin +
    fetch_seq/per_sec seconds) to a crawl_log frame (batch or stream)."""
    from etlpy_spark.sources.synthetic_web import host_expr

    return df.withColumn("host", host_expr(F.col("url"))).withColumn(
        "event_ts",
        F.to_timestamp(F.lit(origin))
        + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), F.col("fetch_seq") / F.lit(per_sec)
        ),
    )


def windowed_fetch_counts(df: DataFrame, window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Per-host tumbling-window fetch counts with a late-data watermark.
    Works identically on a stream (stateful windowed agg, state bounded
    by the watermark) and on a batch frame (the parity oracle in tests:
    same expressions, no state)."""
    src = df if "event_ts" in df.columns else crawl_log_event_time(df)
    if src.isStreaming:
        src = src.withWatermark("event_ts", watermark)
    return (
        src.groupBy("host", F.window("event_ts", window).alias("win"))
        .agg(F.count(F.lit(1)).alias("fetches"))
        .select(
            "host",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "fetches",
        )
    )


def running_host_totals(df: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Cumulative per-host fetch totals across micro-batches —
    ``applyInPandasWithState`` with one integer of state per host. Each
    micro-batch emits one row per host seen in it: the host, its new
    running ``total``, and ``batch_rows`` (this batch's contribution).
    Restarting the stream from its checkpoint resumes the totals from
    the state store (exactly-once across restarts: the source is the
    checkpointed file stream, the state is transactional with it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = df if "host" in df.columns else crawl_log_event_time(df)

    def update(key, pdfs, state):
        import pandas as pd

        rows = 0
        for pdf in pdfs:
            rows += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += rows
        state.update((total,))
        yield pd.DataFrame(
            {"host": [key[0]], "total": [total], "batch_rows": [rows]}
        )

    return src.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=RUNNING_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
