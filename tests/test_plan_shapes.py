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


def test_ann_topk_plans_take_ordered_not_global_window(spark, tmp_path):
    """Every ANN top-k (brute force, fused IVF, persisted-index query)
    must plan the global k-selection as TakeOrderedAndProject — a
    per-partition heap merged on the driver — never as an unpartitioned
    Window funneling the whole scored set through one task (the r4
    scale-killer in query_ivf)."""
    from etlpy_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])

    idx = sim.build_ivf_index(emb, str(tmp_path / "ivf"), n_cells=8)
    pq = sim.build_pq_index(emb, str(tmp_path / "pq"), m=8, ks=64)
    plans = {
        "brute": sim.brute_force_topk(emb, qv, k=10),
        "ivf_fused": sim.ivf_topk(emb, qv, k=10, n_cells=8, nprobe=4),
        "ivf_index": sim.query_ivf(spark, idx, qv, k=10, nprobe=4),
        "pq_adc": sim.query_pq(spark, pq, qv, k=10),
        "pq_rerank": sim.query_pq(spark, pq, qv, k=10, rerank=50, vectors=emb),
        "ivfpq": sim.query_ivfpq(
            spark,
            sim.build_ivfpq_index(emb, str(tmp_path / "ivfpq"), n_cells=8, m=8, ks=64),
            qv, k=10, nprobe=4,
        ),
    }
    for name, df in plans.items():
        df.collect()  # finalize under AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan[:2000])
        # any Window that remains ranks the k survivors AFTER the take —
        # it must appear above TakeOrderedAndProject in the tree, i.e.
        # the take is its descendant, never the other way round
        if "Window" in plan:
            assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name
