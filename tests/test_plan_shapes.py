"""Physical-plan shape invariants the crawl engine relies on.

The politeness selection (frontier.py run_round) filters a per-host
row_number with a LITERAL leading bound exactly so Catalyst's
InferWindowGroupLimit inserts WindowGroupLimit on BOTH sides of the window
shuffle — the map-side partial top-K that turns the politeness shuffle
from O(pending) into O(hosts×K) at a backlogged 10^10-URL frontier. This
test pins the filter shape → plan shape contract so a Spark upgrade or a
refactor that breaks the literal bound fails loudly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_literal_bounded_rank_filter_gets_window_group_limit(spark):
    df = spark.range(0, 50_000).select(
        (F.col("id") % 100).alias("host"),
        F.col("id").alias("seq"),
        (F.col("id") % 7 + 1).cast("int").alias("budget"),
    )
    w = Window.partitionBy("host").orderBy("seq")
    # the engine's exact shape: literal K bound AND data-dependent budget
    out = df.withColumn("hk", F.row_number().over(w)).filter(
        (F.col("hk") <= F.lit(8)) & (F.col("hk") <= F.col("budget"))
    )
    rows = out.collect()  # materialize so AQE finalizes the plan
    assert rows  # budget >= 1 per host, so the selection is non-empty
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_window_group_limit_prunes_same_rows_as_full_window(spark):
    """The pruned plan must select the identical row set as the unpruned
    data-dependent filter alone (budget <= K by construction)."""
    df = spark.range(0, 20_000).select(
        (F.col("id") % 37).alias("host"),
        F.col("id").alias("seq"),
        (F.col("id") % 5 + 1).cast("int").alias("budget"),
    )
    w = Window.partitionBy("host").orderBy("seq")
    ranked = df.withColumn("hk", F.row_number().over(w))
    pruned = ranked.filter((F.col("hk") <= F.lit(8)) & (F.col("hk") <= F.col("budget")))
    full = ranked.filter(F.col("hk") <= F.col("budget"))
    assert sorted(r.seq for r in pruned.collect()) == sorted(
        r.seq for r in full.collect()
    )
