"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a spec-compiled pipeline (the engine's own
stage vocabulary) over sf0.001 lineitem, finished with an aggregation.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary over lineitem driven through the engine's
    pipeline compiler (filter → regex extract → format → dedup stages), then
    a groupBy aggregation. Driver checks rows>0 and schema stability."""
    from etlpy_spark.plans.compiler import CompileContext, compile_stages, finalize
    from etlpy_spark.plans.spec import Stage

    ctx = CompileContext(spark=spark, parallelism=8, files_root=SF0001)
    stages = [
        Stage("DBGE", {"TableName": "lineitem.parquet", "MergeType": "Append"}),
        Stage("RangeFT", {"Column": "l_quantity", "Min": 1, "Max": 49}),
        Stage("MergeTF", {"Format": "{0}|{1}", "Column": "l_returnflag",
                          "MergeWith": "l_linestatus", "NewColumn": "flag_status"}),
    ]
    df = finalize(compile_stages(ctx, stages))
    return (
        df.groupBy("flag_status")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("flag_status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # insertion order is load-bearing: the driver hash-checks the first 50
    # entries — crawl parity / sources / sinks lead, and the total is
    # exactly 50 so every operator family lands under the hard signal
    from etlpy_spark import entry_queries, entry_queries_ext, entry_queries_ml

    return {
        **entry_queries_ext.queries(),
        **entry_queries.queries(),
        **entry_queries_ml.queries(),
    }


def oracle_sql() -> dict[str, str]:
    from etlpy_spark import entry_queries, entry_queries_ext, entry_queries_ml

    return {
        **entry_queries_ext.oracle_sql(),
        **entry_queries.oracle_sql(),
        **entry_queries_ml.oracle_sql(),
    }
