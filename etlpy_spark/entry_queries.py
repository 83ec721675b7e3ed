"""Driver correctness harness: queries() + oracle_sql().

One entry per implemented operator from SURVEY.md §2, run by the driver at
sf=0.01 against DuckDB on the same parquet. Every computed column is aliased
identically on both sides (the driver hashes values after sorting columns by
name). Floating aggregates are rounded on both sides.
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
# queries


def q_range_ge(spark, sf_dir):
    return _pipe(spark, sf_dir, [Stage("RangeGE", {"MinValue": 1, "MaxValue": 20, "Interval": 1, "Column": "temp"})])


def q_zip_merge_golden(spark, sf_dir):
    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 20, "Interval": 1, "Column": "temp", "MergeType": "Append"}),
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 40, "Interval": 2, "Column": "temp2", "MergeType": "Merge"}),
        Stage("PythonTF", {"Script": "temp+temp2", "Column": "temp", "NewColumn": "result"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_cross_lateral_range(spark, sf_dir):
    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 6, "Interval": 1, "Column": "a", "MergeType": "Append"}),
        Stage("RangeGE", {"MinValue": 1, "MaxValue": "[a]", "Interval": 1, "Column": "b", "MergeType": "Cross"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_append_union(spark, sf_dir):
    stages = [
        Stage("TextGE", {"Content": "alpha\nbeta\ngamma", "Column": "s", "MergeType": "Append"}),
        Stage("TextGE", {"Content": "delta\nbeta", "Column": "s", "MergeType": "Append"}),
    ]
    return _pipe(spark, sf_dir, stages)


def q_null_ft(spark, sf_dir):
    df = _t(spark, sf_dir, "documents").withColumn(
        "l2", F.when(F.col("doc_id") % 10 == 0, F.lit(" ")).otherwise(F.col("lang"))
    )
    out = compile_stages(_ctx(spark, sf_dir), [Stage("NullFT", {"Column": "l2"})], _orded(df, "doc_id"))
    return finalize(out).select("doc_id", "l2")


def q_regex_ft(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "documents"), "doc_id")
    out = compile_stages(_ctx(spark, sf_dir), [Stage("RegexFT", {"Column": "text", "Script": "join"})], df)
    return finalize(out).select("doc_id")


def q_range_ft(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "lineitem"), "l_orderkey")
    st = Stage("RangeFT", {"Column": "l_quantity", "Min": 10, "Max": 20})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("l_orderkey", "l_linenumber", "l_quantity")


def q_repeat_ft_dedup(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    out = compile_stages(_ctx(spark, sf_dir), [Stage("RepeatFT", {"Column": "o_custkey"})], df)
    return finalize(out).select("o_custkey", "o_orderkey")


def q_auto_index(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "region"), "r_regionkey")
    out = compile_stages(_ctx(spark, sf_dir), [Stage("AutoIndexTF", {"Column": "r_name", "NewColumn": "idx"})], df)
    return finalize(out).select("r_regionkey", "idx")


def q_rename_delete(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "customer"), "c_custkey")
    stages = [
        Stage("RenameTF", {"Column": "c_name", "NewColumn": "name"}),
        Stage("DeleteTF", {"Column": "c_acctbal"}),
        Stage("DeleteTF", {"Column": "c_nationkey"}),
        Stage("DeleteTF", {"Column": "c_mktsegment"}),
    ]
    return finalize(compile_stages(_ctx(spark, sf_dir), stages, df))


def q_regex_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "customer"), "c_custkey")
    st = Stage("RegexTF", {"Column": "c_name", "Script": r"(\d+)", "Index": 0, "NewColumn": "cnum"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("c_custkey", "cnum")


def q_number_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("NumberTF", {"Column": "o_orderpriority", "Script": r"(-?\d+)(\.\d+)?", "Index": 0, "NewColumn": "prio_num"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "prio_num")


def q_re_replace_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "part"), "p_partkey")
    st = Stage("ReReplaceTF", {"Column": "p_name", "Script": " ", "ReplaceText": "_", "NewColumn": "p_slug"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("p_partkey", "p_slug")


def q_split_tf(spark, sf_dir):
    # NB SplitChar is itself tokenized on spaces (reference etl.py:392), so a
    # literal-space split is inexpressible there; use '-' on orderpriority.
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("SplitTF", {"Column": "o_orderpriority", "SplitChar": "-", "Index": 1, "NewColumn": "prio_tail"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "prio_tail")


def q_regex_split_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("RegexSplitTF", {"Column": "o_orderpriority", "Regex": "-", "Index": 1, "NewColumn": "prio_word"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "prio_word")


def q_trim_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "customer").withColumn("padded", F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" \t")))
    df = _orded(df, "c_custkey")
    st = Stage("TrimTF", {"Column": "padded", "NewColumn": "seg"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("c_custkey", "seg")


def q_str_extract_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "customer").withColumn("wrapped", F.concat(F.lit("<<"), F.col("c_mktsegment"), F.lit(">>")))
    df = _orded(df, "c_custkey")
    st = Stage("StrExtractTF", {"Column": "wrapped", "Former": "<<", "End": ">>", "NewColumn": "seg"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("c_custkey", "seg")


def q_merge_tf_url(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("MergeTF", {"Column": "o_orderkey", "MergeWith": "o_orderstatus",
                           "Format": "http://example.com/order/{0}?s={1}", "NewColumn": "url"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "url")


def q_html_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "part").withColumn("raw", F.concat(F.lit("<b>"), F.col("p_brand"), F.lit("&co")))
    df = _orded(df, "p_partkey")
    st = Stage("HtmlTF", {"Column": "raw", "ConvertType": "Encode", "NewColumn": "escaped"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("p_partkey", "escaped")


def q_url_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "part").withColumn("raw", F.concat(F.col("p_type"), F.lit(" "), F.col("p_brand")))
    df = _orded(df, "p_partkey")
    st = Stage("UrlTF", {"Column": "raw", "ConvertType": "Encode", "NewColumn": "enc"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("p_partkey", "enc")


def q_python_tf_page(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("PythonTF", {"Column": "o_orderkey", "Script": "int(int(value)/15.0+1)", "NewColumn": "page"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "page")


def q_range_tf_offset_limit(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("RangeTF", {"Skip": 10, "Take": 5})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey")


def q_json_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "events"), "event_id")
    st = Stage("JsonTF", {"Column": "props", "Schema": "k string", "NewColumn": "event_id"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("event_id", "k")


def q_dict_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "lineitem"), "l_orderkey")
    st = Stage("DictTF", {"Column": "l_returnflag", "Mapping": "A:accepted,R:returned,N:none", "NewColumn": "flag_label"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("l_orderkey", "l_linenumber", "flag_label")


def q_time2str_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("Time2StrTF", {"Column": "o_orderdate", "Format": "yyyy-MM-dd", "NewColumn": "od"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderkey", "od")


def q_merge_repeat_tf(spark, sf_dir):
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    st = Stage("MergeRepeatTF", {"Column": "o_orderstatus", "NewColumn": "cnt"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("o_orderstatus", "o_orderkey", "cnt")


def q_join_db_tf(spark, sf_dir):
    ctx = _ctx(spark, sf_dir)
    ctx.tables["nation"] = _t(spark, sf_dir, "nation")
    df = _orded(_t(spark, sf_dir, "customer"), "c_custkey")
    st = Stage("JoinDBTF", {"Column": "c_nationkey", "TableName": "nation", "JoinKey": "n_nationkey"})
    out = compile_stages(ctx, [st], df)
    return finalize(out).select("c_custkey", "n_name")


def q_etl_ge_cross(spark, sf_dir):
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


def q_xpath_tf(spark, sf_dir):
    df = _t(spark, sf_dir, "part").withColumn(
        "html",
        F.concat(F.lit('<div><a title="'), F.col("p_name"), F.lit('">x</a><a title="other">y</a></div>')),
    )
    df = _orded(df, "p_partkey")
    st = Stage("XPathTF", {"Column": "html", "XPath": "//a[1]/@title", "IsManyData": True, "NewColumn": "p_partkey"})
    out = compile_stages(_ctx(spark, sf_dir), [st], df)
    return finalize(out).select("p_partkey", "Text")


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
        "range_ge": q_range_ge,
        "zip_merge_golden": q_zip_merge_golden,
        "cross_lateral_range": q_cross_lateral_range,
        "append_union": q_append_union,
        "null_ft": q_null_ft,
        "regex_ft": q_regex_ft,
        "range_ft": q_range_ft,
        "repeat_ft_dedup": q_repeat_ft_dedup,
        "auto_index": q_auto_index,
        "rename_delete": q_rename_delete,
        "regex_tf": q_regex_tf,
        "number_tf": q_number_tf,
        "re_replace_tf": q_re_replace_tf,
        "split_tf": q_split_tf,
        "regex_split_tf": q_regex_split_tf,
        "trim_tf": q_trim_tf,
        "str_extract_tf": q_str_extract_tf,
        "merge_tf_url": q_merge_tf_url,
        "html_tf": q_html_tf,
        "url_tf": q_url_tf,
        "python_tf_page": q_python_tf_page,
        "range_tf_offset_limit": q_range_tf_offset_limit,
        "json_tf": q_json_tf,
        "dict_tf": q_dict_tf,
        "time2str_tf": q_time2str_tf,
        "merge_repeat_tf": q_merge_repeat_tf,
        "join_db_tf": q_join_db_tf,
        "etl_ge_cross": q_etl_ge_cross,
        "xpath_tf": q_xpath_tf,
        "pricing_summary": q_pricing_summary,
        "topk_window": q_topk_window,
        "groupby_metrics": q_groupby_metrics,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "range_ge": "SELECT i AS temp FROM generate_series(1, 19) t(i)",
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
        "null_ft": """
            SELECT doc_id, lang AS l2 FROM documents WHERE doc_id % 10 <> 0
        """,
        "regex_ft": "SELECT doc_id FROM documents WHERE regexp_matches(text, 'join')",
        "range_ft": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 20
        """,
        "repeat_ft_dedup": """
            SELECT o_custkey, min(o_orderkey) AS o_orderkey FROM orders GROUP BY o_custkey
        """,
        "auto_index": """
            SELECT r_regionkey, row_number() OVER (ORDER BY r_regionkey) AS idx FROM region
        """,
        "rename_delete": "SELECT c_custkey, c_name AS name FROM customer",
        "regex_tf": "SELECT c_custkey, regexp_extract(c_name, '(\\d+)', 1) AS cnum FROM customer",
        "number_tf": """
            SELECT o_orderkey, CAST(regexp_extract(o_orderpriority, '(-?\\d+)(\\.\\d+)?', 1) AS BIGINT) AS prio_num
            FROM orders
        """,
        "re_replace_tf": "SELECT p_partkey, replace(p_name, ' ', '_') AS p_slug FROM part",
        "split_tf": """
            SELECT o_orderkey,
                   CASE WHEN len(str_split(o_orderpriority, '-')) > 1
                        THEN str_split(o_orderpriority, '-')[2] ELSE '' END AS prio_tail
            FROM orders
        """,
        "regex_split_tf": """
            SELECT o_orderkey,
                   CASE WHEN len(regexp_split_to_array(o_orderpriority, '-')) > 1
                        THEN regexp_split_to_array(o_orderpriority, '-')[2]
                        ELSE o_orderpriority END AS prio_word
            FROM orders
        """,
        "trim_tf": "SELECT c_custkey, c_mktsegment AS seg FROM customer",
        "str_extract_tf": "SELECT c_custkey, c_mktsegment AS seg FROM customer",
        "merge_tf_url": """
            SELECT o_orderkey,
                   'http://example.com/order/' || o_orderkey || '?s=' || o_orderstatus AS url
            FROM orders
        """,
        "html_tf": """
            SELECT p_partkey, '&lt;b&gt;' || p_brand || '&amp;co' AS escaped FROM part
        """,
        "url_tf": """
            SELECT p_partkey,
                   replace(replace(p_type || ' ' || p_brand, ' ', '%20'), '#', '%23') AS enc
            FROM part
        """,
        "python_tf_page": """
            SELECT o_orderkey, CAST(FLOOR(o_orderkey / 15.0 + 1) AS BIGINT) AS page FROM orders
        """,
        "range_tf_offset_limit": """
            SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10
        """,
        "json_tf": """
            SELECT event_id, CAST(props->>'k' AS VARCHAR) AS k FROM events
        """,
        "dict_tf": """
            SELECT l_orderkey, l_linenumber,
                   CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned'
                        WHEN 'N' THEN 'none' ELSE l_returnflag END AS flag_label
            FROM lineitem
        """,
        "time2str_tf": "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od FROM orders",
        "merge_repeat_tf": """
            SELECT o_orderstatus, min(o_orderkey) AS o_orderkey, count(*) AS cnt
            FROM orders GROUP BY o_orderstatus
        """,
        "join_db_tf": """
            SELECT c_custkey, n_name FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        """,
        "etl_ge_cross": """
            SELECT s.color, t.n FROM generate_series(1,3) t(n), (VALUES ('red'),('green')) s(color)
        """,
        "xpath_tf": "SELECT p_partkey, p_name AS Text FROM part",
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
