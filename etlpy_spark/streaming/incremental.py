"""Structured-Streaming bridge over append-only snapshot tables.

The CRAWL itself is deliberately batch-per-round (SURVEY.md §2.2: the
north rule demands exactly reproducible crawl ordering, which Structured
Streaming's micro-batch scheduling cannot pin), but its OUTPUT tables —
crawl_log, images, metrics — are append-only streams of committed rows,
and at 100 TB a downstream consumer (corpus annotation, pHash stats,
dashboarding) must not re-scan the whole table after every round. This
module turns such a table into a Structured Streaming source so each
round's new part files are processed EXACTLY ONCE: Spark's
FileStreamSource checkpoints the set of seen files, so a resumed job
picks up only what the frontier committed since the last trigger.

Scope (honest limits):
  * append-only tables ONLY. The file source sees every data file ever
    written, so tombstoned rows (merge-on-read tables: frontier, a seen
    table after ``forget``) and compaction rewrites would surface as
    phantom appends. The crawl's log/images/metrics tables are
    append-only by construction; ``stream_snapshot_table`` refuses a
    table whose current snapshot carries tombstones.
  * file-commit granularity. Rows become visible to the stream when
    their part file lands (atomic rename), which is within the same
    round as the manifest commit; a crashed round's re-run re-writes
    byte-identical part files under the SAME names, which the source —
    having recorded the name — does not re-process: no duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_snapshot_table(
    spark: SparkSession, path: str, schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """→ streaming DataFrame over a SnapshotTable's data files.

    ``schema`` is the table DDL (file sources require it up front —
    e.g. ``frontier.LOG_DDL``). ``max_files_per_trigger`` bounds a
    micro-batch for steady backpressure on a live crawl; leave None for
    availableNow/catch-up jobs."""
    from etlpy_spark.sources.catalog import SnapshotTable

    tbl = SnapshotTable(spark, path)
    cur = tbl.current_version()
    if cur is not None and tbl.snapshot(cur).delete_dirs:
        raise ValueError(
            f"{path} carries merge-on-read tombstones: the file stream "
            "would surface deleted rows; stream append-only tables only"
        )
    rd = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        rd = rd.option("maxFilesPerTrigger", max_files_per_trigger)
    # data/* matches every committed version dir; hidden tmp files
    # (.tmp-*) and in-progress attempt dirs (*.inprogress) are excluded
    # by Spark's hidden-file filter / the glob shape respectively
    return rd.parquet(os.path.join(path, "data", "*"))


def process_increment(
    stream_df: DataFrame, sink_dir: str, checkpoint_dir: str,
    transform=None,
) -> None:
    """Run ONE exactly-once catch-up pass: apply ``transform`` (a
    DataFrame→DataFrame function, default identity) to every row
    appended since the last call with this ``checkpoint_dir``, appending
    the results to ``sink_dir`` as parquet, then stop. Each call
    processes only the NEW part files (FileStreamSource's checkpointed
    file log is the increment tracker) — the per-round pattern a
    100 TB-scale consumer runs after each crawl round instead of a full
    table re-scan. Idempotent under re-run: a crashed pass resumes from
    the checkpoint's write-ahead log."""
    out = transform(stream_df) if transform is not None else stream_df
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
