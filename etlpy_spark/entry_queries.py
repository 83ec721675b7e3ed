"""Driver correctness harness part 1: the core stage vocabulary.

One entry per operator FAMILY from SURVEY.md §2, run by the driver at
sf=0.01 against DuckDB on the same parquet. Round 2 consolidation: the
driver hash-checks the first 50 ``queries()`` entries, so single-op
queries that shared a table are now CHAINED pipelines — each stage in a
chain is still individually load-bearing (dropping any stage changes the
oracle hash). The operator→query map lives in SURVEY.md §2.

Every computed column is aliased identically on both sides (the driver
hashes values after sorting columns by name). Floating aggregates are
rounded on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etlpy_spark.plans.compiler import ORD, CompileContext, compile_stages, finalize
from etlpy_spark.plans.spec import EtlModule, ProjectSpec, Stage


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ctx(spark: SparkSession, sf_dir: str) -> CompileContext:
    return CompileContext(spark=spark, parallelism=8, files_root=sf_dir)


def _pipe(spark, sf_dir, stages: list[Stage], ordered: bool = False) -> DataFrame:
    return finalize(compile_stages(_ctx(spark, sf_dir), stages), ordered=ordered)


def _orded(df: DataFrame, col: str) -> DataFrame:
    """Attach the stream-order vector keyed on an explicit column, so
    order-sensitive operators have the same defined order as the oracle."""
    return df.withColumn(ORD, F.array(F.col(col).cast("long")))


# ---------------------------------------------------------------------------
# generators / merge semantics


def q_zip_merge_golden(spark, sf_dir):
    """RangeGE ×2 + MergeType=Merge (positional zip) + PythonTF — the
    reference's own golden pipeline (project.xml:9-13)."""
    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 20, "Interval": 1, "Column": "temp", "MergeType": "Append"}),
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 40, "Interval": 2, "Column": "temp2", "MergeType": "Merge"}),
        Stage("PythonTF", {"Script": "temp+temp2", "Column": "temp", "NewColumn": "result"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_cross_lateral_range(spark, sf_dir):
    """RangeGE with correlated ``[col]`` bound + MergeType=Cross (lateral)."""
    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 6, "Interval": 1, "Column": "a", "MergeType": "Append"}),
        Stage("RangeGE", {"MinValue": 1, "MaxValue": "[a]", "Interval": 1, "Column": "b", "MergeType": "Cross"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_append_union(spark, sf_dir):
    """TextGE + MergeType=Append (order-preserving union)."""
    stages = [
        Stage("TextGE", {"Content": "alpha\nbeta\ngamma", "Column": "s", "MergeType": "Append"}),
        Stage("TextGE", {"Content": "delta\nbeta", "Column": "s", "MergeType": "Append"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_etl_ge_cross(spark, sf_dir):
    """EtlGE invoking another module as a Cross generator."""
    proj = ProjectSpec()
    proj.modules["colors"] = EtlModule(
        name="colors", stages=[Stage("TextGE", {"Content": "red\ngreen", "Column": "color", "MergeType": "Append"})]
    )
    proj.modules["main"] = EtlModule(
        name="main",
        stages=[
            Stage("RangeGE", {"MinValue": 1, "MaxValue": 4, "Interval": 1, "Column": "n", "MergeType": "Append"}),
            Stage("EtlGE", {"ETLSelector": "colors", "MergeType": "Cross"}),
        ],
    )
    ctx = CompileContext(spark=spark, project=proj, parallelism=8, files_root=sf_dir)
    from etlpy_spark.plans.compiler import compile_module

    return finalize(compile_module(ctx, "main"))


# ---------------------------------------------------------------------------
# filters


def q_null_regex_ft(spark, sf_dir):
    """NullFT (blank drop) chained with RegexFT (match keep) on documents."""
    df = _t(spark, sf_dir, "documents").withColumn(
        "l2", F.when(F.col("doc_id") % 10 == 0, F.lit(" ")).otherwise(F.col("lang"))
    )
    stages = [
        Stage("NullFT", {"Column": "l2"}),
        Stage("RegexFT", {"Column": "text", "Script": "join"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, _orded(df, "doc_id"))
    return finalize(out).select("doc_id", "l2")


def q_range_num_ft(spark, sf_dir):
    """RangeFT then NumRangeFT on lineitem (intersecting numeric bands)."""
    df = _orded(_t(spark, sf_dir, "lineitem"), "l_orderkey")
    stages = [
        Stage("RangeFT", {"Column": "l_quantity", "Min": 10, "Max": 30}),
        Stage("NumRangeFT", {"Column": "l_quantity", "Min": 5, "Max": 20}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("l_orderkey", "l_linenumber", "l_quantity")


def q_repeat_ft_dedup(spark, sf_dir):
    """RepeatFT: stateful keep-first dedup over the stream."""
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    out = compile_stages(_ctx(spark, sf_dir), [Stage("RepeatFT", {"Column": "o_custkey"})], df)
    return finalize(out).select("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# column-op chains


def q_column_ops_chain(spark, sf_dir):
    """AutoIndexTF + AddNewTF + RenameTF + DeleteTF + TrimTF + StrExtractTF
    + FileExistFT in ONE chain on customer (round-3/5 driver-slot
    consolidation; every stage is load-bearing for the oracle hash —
    FileExistFT probes an existing parquet path for even keys and a
    missing one for odd keys)."""
    df = (
        _t(spark, sf_dir, "customer")
        .withColumn("padded", F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" \t")))
        .withColumn("wrapped", F.concat(F.lit("<<"), F.col("c_mktsegment"), F.lit(">>")))
        .withColumn(
            "path",
            F.when(
                F.col("c_custkey") % 2 == 0, F.lit(f"{sf_dir}/region.parquet")
            ).otherwise(F.lit(f"{sf_dir}/no_such_table.parquet")),
        )
    )
    df = _orded(df, "c_custkey")
    stages = [
        Stage("TrimTF", {"Column": "padded", "NewColumn": "seg1"}),
        Stage("StrExtractTF", {"Column": "wrapped", "Former": "<<", "End": ">>", "NewColumn": "seg2"}),
        Stage("AutoIndexTF", {"Column": "c_mktsegment", "NewColumn": "idx"}),
        Stage("AddNewTF", {"NewValue": "const", "NewColumn": "tag"}),
        Stage("AddNewTF", {"NewValue": "temp", "NewColumn": "tmp"}),
        Stage("RenameTF", {"Column": "c_mktsegment", "NewColumn": "name"}),
        Stage("DeleteTF", {"Column": "tmp"}),
        Stage("FileExistFT", {"Column": "path", "NewColumn": "does_exist"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select(
        "c_custkey", "idx", "tag", "name", "seg1", "seg2", "does_exist"
    )


def q_regex_ops_chain(spark, sf_dir):
    """RegexTF + NumberTF + ReReplaceTF on orders.o_orderpriority."""
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    stages = [
        Stage("RegexTF", {"Column": "o_orderpriority", "Script": r"([A-Z]+)", "Index": 0, "NewColumn": "prio_word"}),
        Stage("NumberTF", {"Column": "o_orderpriority", "Script": r"(-?\d+)(\.\d+)?", "Index": 0, "NewColumn": "prio_num"}),
        Stage("ReReplaceTF", {"Column": "o_orderpriority", "Script": "-", "ReplaceText": "_", "NewColumn": "prio_slug"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("o_orderkey", "prio_word", "prio_num", "prio_slug")


def q_split_ops_chain(spark, sf_dir):
    """SplitTF + RegexSplitTF on orders (distinct out-of-range fallbacks:
    SplitTF yields '', RegexSplitTF yields the original)."""
    # NB SplitChar is itself tokenized on spaces (reference etl.py:392), so a
    # literal-space split is inexpressible there; use '-' on orderpriority.
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    stages = [
        Stage("SplitTF", {"Column": "o_orderpriority", "SplitChar": "-", "Index": 1, "NewColumn": "prio_tail"}),
        Stage("RegexSplitTF", {"Column": "o_orderpriority", "Regex": "-", "Index": 1, "NewColumn": "prio_word"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("o_orderkey", "prio_tail", "prio_word")


def q_encode_ops_chain(spark, sf_dir):
    """HtmlTF + UrlTF encodes on part."""
    df = (
        _t(spark, sf_dir, "part")
        .withColumn("raw1", F.concat(F.lit("<b>"), F.col("p_brand"), F.lit("&co")))
        .withColumn("raw2", F.concat(F.col("p_type"), F.lit(" "), F.col("p_brand")))
    )
    df = _orded(df, "p_partkey")
    stages = [
        Stage("HtmlTF", {"Column": "raw1", "ConvertType": "Encode", "NewColumn": "escaped"}),
        Stage("UrlTF", {"Column": "raw2", "ConvertType": "Encode", "NewColumn": "enc"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("p_partkey", "escaped", "enc")


def q_python_merge_tf(spark, sf_dir):
    """PythonTF (compiled arithmetic) + MergeTF (format-string merge)."""
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    stages = [
        Stage("PythonTF", {"Column": "o_orderkey", "Script": "int(int(value)/15.0+1)", "NewColumn": "page"}),
        Stage("MergeTF", {"Column": "o_orderkey", "MergeWith": "o_orderstatus",
                          "Format": "http://example.com/order/{0}?s={1}", "NewColumn": "url"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("o_orderkey", "page", "url")


def q_dict_time_tf(spark, sf_dir):
    """DictTF (lookup mapping) + Time2StrTF (date format) on orders."""
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    stages = [
        Stage("DictTF", {"Column": "o_orderstatus", "Mapping": "F:done,O:open,P:partial", "NewColumn": "status_label"}),
        Stage("Time2StrTF", {"Column": "o_orderdate", "Format": "yyyy-MM-dd", "NewColumn": "od"}),
    ]
    out = compile_stages(_ctx(spark, sf_dir), stages, df)
    return finalize(out).select("o_orderkey", "status_label", "od")


# ---------------------------------------------------------------------------
# semi-structured / joins


def q_json_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "events"), "event_id")
    st = Stage("JsonTF", {"Column": "props", "Schema": "k string", "NewColumn": "event_id"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("event_id", "k")


def q_xpath_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "part").withColumn(
        "html",
        F.concat(F.lit('<div><a title="'), F.col("p_name"), F.lit('">x</a><a title="other">y</a></div>')),
    )
    df = _orded(df, "p_partkey")
    st = Stage("XPathTF", {"Column": "html", "XPath": "//a[1]/@title", "IsManyData": True, "NewColumn": "p_partkey"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("p_partkey", "Text")


def q_join_db_tf(spark, sf_dir):
    ctx = _ctx(spark, sf_dir)
    ctx.tables["nation"] = _t(spark, sf_dir, "nation")
    df = _orded(_t(spark, sf_dir, "customer"), "c_custkey")
    st = Stage("JoinDBTF", {"Column": "c_nationkey", "TableName": "nation", "JoinKey": "n_nationkey"})
    out = compile_stages(ctx, [st], df)
    return finalize(out).select("c_custkey", "n_name")


# ---------------------------------------------------------------------------
# aggregations / windows (SURVEY §2: absent in reference, needed at scale)


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderstatus", "o_orderkey", "rk")
    )


def q_groupby_metrics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "zip_merge_golden": q_zip_merge_golden,
        "cross_lateral_range": q_cross_lateral_range,
        "append_union": q_append_union,
        "etl_ge_cross": q_etl_ge_cross,
        "null_regex_ft": q_null_regex_ft,
        "range_num_ft": q_range_num_ft,
        "repeat_ft_dedup": q_repeat_ft_dedup,
        "column_ops_chain": q_column_ops_chain,
        "regex_ops_chain": q_regex_ops_chain,
        "split_ops_chain": q_split_ops_chain,
        "encode_ops_chain": q_encode_ops_chain,
        "python_merge_tf": q_python_merge_tf,
        "dict_time_tf": q_dict_time_tf,
        "json_tf": q_json_tf,
        "xpath_tf": q_xpath_tf,
        "join_db_tf": q_join_db_tf,
        "pricing_summary": q_pricing_summary,
        "topk_window": q_topk_window,
        "groupby_metrics": q_groupby_metrics,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "zip_merge_golden": """
            WITH a AS (SELECT i AS temp, row_number() OVER (ORDER BY i) AS rn FROM generate_series(1,19) t(i)),
                 b AS (SELECT i AS temp2, row_number() OVER (ORDER BY i) AS rn FROM generate_series(1,39,2) t(i))
            SELECT a.temp, b.temp2, a.temp + b.temp2 AS result FROM a JOIN b USING (rn)
        """,
        "cross_lateral_range": """
            SELECT t.a, s.b FROM generate_series(1,5) t(a)
            JOIN generate_series(1,4) s(b) ON s.b <= t.a - 1
        """,
        "append_union": """
            SELECT * FROM (VALUES ('alpha'),('beta'),('gamma'),('delta'),('beta')) v(s)
        """,
        "etl_ge_cross": """
            SELECT s.color, t.n FROM generate_series(1,3) t(n), (VALUES ('red'),('green')) s(color)
        """,
        "null_regex_ft": """
            SELECT doc_id, lang AS l2 FROM documents
            WHERE doc_id % 10 <> 0 AND regexp_matches(text, 'join')
        """,
        "range_num_ft": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 20
        """,
        "repeat_ft_dedup": """
            SELECT o_custkey, min(o_orderkey) AS o_orderkey FROM orders GROUP BY o_custkey
        """,
        "column_ops_chain": """
            SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS idx,
                   'const' AS tag, c_mktsegment AS name,
                   c_mktsegment AS seg1, c_mktsegment AS seg2,
                   CASE WHEN c_custkey % 2 = 0 THEN 'True' ELSE 'False' END
                       AS does_exist
            FROM customer
        """,
        "regex_ops_chain": """
            SELECT o_orderkey,
                   regexp_extract(o_orderpriority, '([A-Z]+)', 1) AS prio_word,
                   CAST(regexp_extract(o_orderpriority, '(-?\\d+)(\\.\\d+)?', 1) AS BIGINT) AS prio_num,
                   replace(o_orderpriority, '-', '_') AS prio_slug
            FROM orders
        """,
        "split_ops_chain": """
            SELECT o_orderkey,
                   CASE WHEN len(str_split(o_orderpriority, '-')) > 1
                        THEN str_split(o_orderpriority, '-')[2] ELSE '' END AS prio_tail,
                   CASE WHEN len(regexp_split_to_array(o_orderpriority, '-')) > 1
                        THEN regexp_split_to_array(o_orderpriority, '-')[2]
                        ELSE o_orderpriority END AS prio_word
            FROM orders
        """,
        "encode_ops_chain": """
            SELECT p_partkey,
                   '&lt;b&gt;' || p_brand || '&amp;co' AS escaped,
                   replace(replace(p_type || ' ' || p_brand, ' ', '%20'), '#', '%23') AS enc
            FROM part
        """,
        "python_merge_tf": """
            SELECT o_orderkey,
                   CAST(FLOOR(o_orderkey / 15.0 + 1) AS BIGINT) AS page,
                   'http://example.com/order/' || o_orderkey || '?s=' || o_orderstatus AS url
            FROM orders
        """,
        "dict_time_tf": """
            SELECT o_orderkey,
                   CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open'
                        WHEN 'P' THEN 'partial' ELSE o_orderstatus END AS status_label,
                   strftime(o_orderdate, '%Y-%m-%d') AS od
            FROM orders
        """,
        "json_tf": """
            SELECT event_id, CAST(props->>'k' AS VARCHAR) AS k FROM events
        """,
        "xpath_tf": "SELECT p_partkey, p_name AS Text FROM part",
        "join_db_tf": """
            SELECT c_custkey, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "topk_window": """
            SELECT o_orderstatus, o_orderkey, rk FROM (
              SELECT o_orderstatus, o_orderkey,
                     row_number() OVER (PARTITION BY o_orderstatus
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3
        """,
        "groupby_metrics": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY event_type
        """,
    }
