"""Complex operator builders: nested data, sub-pipelines, fetch joins,
sources and sinks.

Python appears only inside Arrow-batched pandas UDFs (fetch, HTML parse) —
never row-at-a-time in the JVM row path.
"""

from __future__ import annotations

import io
import json
import os
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from etlpy_spark.functions.expr import xpath_lite, xpath_lite_text, _node_text
from etlpy_spark.plans.compiler import (
    ORD,
    CompileContext,
    apply_generator,
    compile_stages,
    ord_append,
    register,
    with_ord,
    zip_merge,
)
from etlpy_spark.plans.spec import CrawlerSpec, EtlModule, Stage


def _merge_query_cols(new_column: str) -> list[str]:
    """MergeQuery column list semantics (reference extends.py:30-36):
    空 string → no parent columns carried."""
    s = (new_column or "").strip()
    return s.split(" ") if s else []


# ---------------------------------------------------------------------------
# Semi-structured


@register("JsonTF")
def json_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Parse a JSON column; a JSON array yields one row per element
    (reference etl.py:508-523; only the doc-list mode is functional there).
    Spark-first: from_json with a schema — provided via the ``Schema`` attr
    (DDL) or inferred once driver-side from a bounded sample (the reference
    itself infers by sampling 20 rows, extends.py:8-16)."""
    col = st.column
    if col not in df.columns:
        return df
    ddl = st.get("Schema", "")
    if ddl:
        elem = T._parse_datatype_string(ddl)
    else:
        sample = [r[0] for r in df.select(col).filter(F.col(col).isNotNull()).limit(20).collect()]
        keys: dict[str, bool] = {}
        for s in sample:
            try:
                js = json.loads(s)
            except (TypeError, ValueError):
                continue
            docs = js if isinstance(js, list) else [js]
            for d in docs:
                if isinstance(d, dict):
                    for k in d:
                        keys[k] = True
        elem = T.StructType([T.StructField(k, T.StringType()) for k in keys])
    arr_schema = T.ArrayType(elem)

    # normalize: single object → 1-element array, array stays (reference
    # yields one row per element for lists, one row for dicts)
    normalized = F.when(
        F.trim(F.col(col)).startswith("["), F.from_json(F.col(col), arr_schema)
    ).otherwise(F.array(F.from_json(F.col(col), elem)))
    keep = _merge_query_cols(st.new_column)
    parent_cols = [c for c in keep if c in df.columns]
    out = df.select(
        *parent_cols, F.col(ORD), F.posexplode(normalized).alias("__pos__", "__doc__")
    )
    out = out.withColumn(ORD, F.concat(F.col(ORD), F.array(F.col("__pos__").cast("long"))))
    child = [f.name for f in elem.fields]
    # child fields first, parent MergeQuery cols override nothing (child wins
    # per extends.MergeQuery writing parent cols INTO the child dict)
    sel = [F.col("__doc__")[f].alias(f) for f in child if f not in parent_cols]
    return out.select(*sel, *parent_cols, ORD)


def _parse_html(html: str) -> ET.Element | None:
    """Parse (X)HTML via xml.etree — the synthetic web emits well-formed
    XHTML; lxml is not in the environment. Falls back to a lenient cleanup."""
    if html is None:
        return None
    try:
        return ET.fromstring(html)
    except ET.ParseError:
        cleaned = re.sub(r"&(?!amp;|lt;|gt;|quot;|apos;|#)", "&amp;", html)
        try:
            return ET.fromstring(cleaned)
        except ET.ParseError:
            return None


_XPATH_NODE = T.ArrayType(
    T.StructType([T.StructField("Text", T.StringType()), T.StructField("HTML", T.StringType())])
)


@register("XPathTF")
def xpath_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """HTML node selection by XPath (reference etl.py:474-501). Many-mode
    yields {Text, HTML, OHTML} per node plus the parent columns named in
    NewColumn (MergeQuery semantics); single-mode writes the first node's
    text into the target column. Parse happens once per Arrow batch in a
    pandas UDF."""
    xp = str(st.get("XPath", ""))
    many = bool(st.get("IsManyData", False))
    col = st.column
    if col not in df.columns:
        return df

    @pandas_udf(_XPATH_NODE)
    def _select(html_s: pd.Series) -> pd.Series:
        out = []
        for h in html_s:
            root = _parse_html(h)
            if root is None:
                out.append([])
                continue
            try:
                nodes = xpath_lite(root, xp)
            except ValueError:
                nodes = []
            recs = []
            for n in nodes:
                if isinstance(n, str):
                    recs.append({"Text": n, "HTML": n})
                else:
                    recs.append(
                        {"Text": _node_text(n), "HTML": ET.tostring(n, encoding="unicode")}
                    )
            out.append(recs)
        return pd.Series(out)

    nodes = _select(F.col(col))
    if many:
        keep = [c for c in _merge_query_cols(st.new_column) if c in df.columns]
        out = df.select(*keep, F.col(ORD), F.posexplode(nodes).alias("__pos__", "__n__"))
        out = out.withColumn(ORD, F.concat(F.col(ORD), F.array(F.col("__pos__").cast("long"))))
        return out.select(
            F.col("__n__")["Text"].alias("Text"),
            F.col("__n__")["HTML"].alias("HTML"),
            F.col("__n__")["HTML"].alias("OHTML"),
            *keep,
            ORD,
        )
    first = F.element_at(nodes, 1)
    return df.withColumn(st.target, first["Text"])


# ---------------------------------------------------------------------------
# Sub-pipeline operators


@register("EtlGE")
def etl_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """Invoke another module as a source / combinator
    (reference etl.py:557-561). Append → UNION ALL, Merge → positional zip,
    Cross → per-row re-run of the (parent-independent) sub-pipeline, which
    relationally is a cross join with right-side override
    (extends.Cross, extends.py:66-73)."""
    sub = ctx.project.module(str(st.get("ETLSelector")))
    if not isinstance(sub, EtlModule):
        raise TypeError("EtlGE selector must reference an ETL module")

    def make_source() -> DataFrame:
        return compile_stages(ctx, sub.stages, None)

    return apply_generator(ctx, df, st, make_source)


@register("EtlTF")
def etl_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Run a sub-pipeline per row, flatMap the results merged with the
    parent's NewColumn columns (reference etl.py:580-590). The reference
    seeds the sub-pipeline's generator chain with the single parent row —
    i.e. the sub-pipeline's stages simply continue the parent stream — so we
    fold the sub-stages onto the current plan."""
    sub = ctx.project.module(str(st.get("ETLSelector")))
    keep = [c for c in _merge_query_cols(st.new_column) if c in df.columns]
    # MergeQuery copies the PARENT row's NewColumn values into each child
    # dict (reference extends.py:30-36) — i.e. kept columns come from the
    # parent even when the sub-pipeline drops/overwrites them. Snapshot them
    # under hidden names that ride through the sub-plan, then restore:
    # no lateral join needed, the lineage IS the correlation.
    hidden = {c: f"__etltf_keep_{i}__" for i, c in enumerate(keep)}
    src = df
    for c, h in hidden.items():
        src = src.withColumn(h, F.col(c))
    out = compile_stages(ctx, sub.stages, src)
    for c, h in hidden.items():
        out = out.withColumn(c, F.col(h)).drop(h)
    return out


@register("EtlEX")
def etl_ex(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Run a sub-pipeline per row for side effects + count
    (reference etl.py:563-578). Executor: registered as a sink; pass-through
    when execute=False (etl.py:913-914)."""
    sub = ctx.project.module(str(st.get("ETLSelector")))

    if ctx.execute:
        result = compile_stages(ctx, sub.stages, df)

        def sink(_: DataFrame) -> None:
            n = result.count()
            if not hasattr(ctx, "metrics"):
                ctx.metrics = []  # type: ignore[attr-defined]
            ctx.metrics.append((st.get("ETLSelector"), n))  # type: ignore[attr-defined]

        ctx.sinks.append(("EtlEX", sink))
    return df


# ---------------------------------------------------------------------------
# Fetch join (CrawlerTF)


def _crawler_fields(crawler: CrawlerSpec) -> list[str]:
    seen: dict[str, None] = {}
    for ci in crawler.crawl_items:
        seen[ci.name] = None
    return list(seen)


@register("CrawlerTF")
def crawler_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """The fetch join (reference etl.py:444-471): for each row take the URL
    from Column, fetch+extract via the named SmartCrawler, yield one (One
    mode, merged over the parent) or many (List mode, extracted fields plus
    the parent columns named in NewColumn) rows.

    Spark shape: Arrow-batched fetch UDF returning array<struct<fields>>,
    then posexplode. The reference's 100-URL memo buffer (etl.py:454-464)
    generalizes to the crawl engine's seen-set; within a plan, identical
    URLs in one batch hit a per-batch memo dict."""
    crawler = ctx.project.module(str(st.get("CrawlerSelector")))
    if not isinstance(crawler, CrawlerSpec):
        raise TypeError("CrawlerSelector must reference a SmartCrawler module")
    if ctx.fetcher is None:
        raise RuntimeError("CompileContext.fetcher not configured")
    fetch = ctx.fetcher(crawler)  # (list[str]) -> list[list[dict[str,str]]]
    fields = _crawler_fields(crawler)
    schema = T.ArrayType(T.StructType([T.StructField(f, T.StringType()) for f in fields]))
    is_list = crawler.is_multi_data == "List"

    @pandas_udf(schema)
    def _fetch(urls: pd.Series) -> pd.Series:
        memo: dict[str, list[dict[str, str]]] = {}
        out = []
        todo = [u for u in urls if u is not None and u not in memo]
        # batch fetch of unique URLs (vectorized politeness lives upstream)
        uniq = list(dict.fromkeys(todo))
        results = fetch(uniq)
        memo.update(dict(zip(uniq, results)))
        for u in urls:
            out.append(memo.get(u, []))
        return pd.Series(out)

    col = st.column
    recs = _fetch(F.col(col))
    if is_list:
        keep = [c for c in _merge_query_cols(st.new_column) if c in df.columns]
        out = df.select(*keep, F.col(ORD), F.posexplode(recs).alias("__pos__", "__rec__"))
        out = out.withColumn(ORD, F.concat(F.col(ORD), F.array(F.col("__pos__").cast("long"))))
        sel = [F.col("__rec__")[f].alias(f) for f in fields if f not in keep]
        return out.select(*sel, *keep, ORD)
    one = F.element_at(recs, 1)
    out = df
    for f in fields:
        out = out.withColumn(f, one[f])
    return out


# ---------------------------------------------------------------------------
# Connector sources / sinks


def _connector_path(ctx: CompileContext, st: Stage) -> str:
    path = str(st.get("TableName", ""))
    if not os.path.isabs(path):
        path = os.path.join(ctx.files_root, path)
    return path


@register("DBGE")
def dbge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """File/DB source (reference etl.py:184-210): csv/tsv/json by extension,
    parquet as the native scale format, and the reference's primary DB —
    MongoDB — as a ``mongodb://host/db.collection`` TableName routed to
    ``spark.read.format('mongodb')`` (sources/mongo.py builds the options;
    needs the connector jar + a live server, so covered by spec tests
    offline)."""
    from etlpy_spark.sources.mongo import is_mongo_uri, mongo_read_spec

    raw = str(st.get("TableName", ""))
    if is_mongo_uri(raw):
        fmt, opts = mongo_read_spec(raw)

        def make_mongo() -> DataFrame:
            src = ctx.spark.read.format(fmt).options(**opts).load()
            return src.withColumn(ORD, F.array(F.monotonically_increasing_id()))

        return apply_generator(ctx, df, st, make_mongo)

    path = _connector_path(ctx, st)
    ext = path.rsplit(".", 1)[-1].lower()

    def make_source() -> DataFrame:
        if ext == "csv":
            src = ctx.spark.read.csv(path, header=True)
        elif ext == "txt":
            src = ctx.spark.read.csv(path, header=True, sep="\t")
        elif ext == "json":
            src = ctx.spark.read.json(path)
        elif ext == "parquet":
            src = ctx.spark.read.parquet(path)
        else:
            raise ValueError(f"unsupported extension {ext!r}")
        return src.withColumn(ORD, F.array(F.monotonically_increasing_id()))

    return apply_generator(ctx, df, st, make_source)


@register("DbEX")
def dbex(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """File/DB sink (reference etl.py:149-181). Executor semantics: collected
    as a sink, skipped in dry-run. ``ExecuteType=InsertOrUpdate`` (the
    reference's MongoDB ``table.save`` upsert, etl.py:158-161) routes to the
    snapshot catalog's MERGE (``SnapshotTable.merge_upsert``) keyed on the
    ``Key`` attr (default: first column); plain files get overwrite."""
    if not ctx.execute:
        return df
    from etlpy_spark.sources.mongo import is_mongo_uri, mongo_write_spec

    raw = str(st.get("TableName", ""))
    if is_mongo_uri(raw):
        # reference etl.py:149-181 Mongo semantics: OnlyInsert = append,
        # InsertOrUpdate = per-document replace upsert keyed by Key
        fmt, mode, opts = mongo_write_spec(
            raw,
            execute_type=str(st.get("ExecuteType", "OnlyInsert")) or "OnlyInsert",
            key=str(st.get("Key", "")) or None,
        )

        def sink(out: DataFrame) -> None:
            data = out.drop(ORD) if ORD in out.columns else out
            data.write.format(fmt).mode(mode).options(**opts).save()

        ctx.sinks.append(("DbEX", sink))
        return df

    path = _connector_path(ctx, st)
    ext = path.rsplit(".", 1)[-1].lower()

    if str(st.get("ExecuteType", "")) == "InsertOrUpdate":
        from etlpy_spark.sources.catalog import SnapshotTable

        def sink(out: DataFrame) -> None:
            data = out.drop(ORD) if ORD in out.columns else out
            key = str(st.get("Key", "")) or data.columns[0]
            SnapshotTable(ctx.spark, path).merge_upsert(data, key=key, prefer_new=True)

        ctx.sinks.append(("DbEX", sink))
        return df

    def sink(out: DataFrame) -> None:
        data = out.drop(ORD) if ORD in out.columns else out
        if ext == "csv":
            data.write.mode("overwrite").option("header", True).csv(path)
        elif ext == "txt":
            data.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
        elif ext == "json":
            data.write.mode("overwrite").json(path)
        else:
            data.write.mode("overwrite").parquet(path)

    ctx.sinks.append(("DbEX", sink))
    return df


@register("TableEX")
def table_ex(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Append stream to a named in-memory table (reference etl.py:609-620) →
    temp view + cache."""
    name = str(st.get("Table", st.get("NewTableName", "Table")))
    if ctx.execute:
        ctx.tables[name] = df
        df.createOrReplaceTempView(re.sub(r"\W", "_", name))
    return df


@register("WriteFileTextTF")
def write_file_text_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Write text column to files (reference etl.py:685-686 stub)."""
    if ctx.execute:
        path = _connector_path(ctx, st) or os.path.join(ctx.files_root, "out_text")

        def sink(out: DataFrame) -> None:
            out.select(F.col(st.column).cast("string").alias("value")).write.mode(
                "overwrite"
            ).text(path)

        ctx.sinks.append(("WriteFileTextTF", sink))
    return df


@register("ReadFileTextTF")
def read_file_text_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Read file content per path value (reference etl.py:682-683 stub)."""
    if st.column not in df.columns:
        return df

    @pandas_udf("string")
    def _read(paths: pd.Series) -> pd.Series:
        def rd(p):
            if p is None or not os.path.exists(p):
                return None
            with io.open(p, "r", encoding="utf-8") as f:
                return f.read()

        return paths.map(rd)

    target = st.new_column or st.column
    return df.withColumn(target, _read(F.col(st.column)))


@register("JoinDBTF")
def join_db_tf(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """Join against a named table (reference etl.py:646-647 stub).
    Broadcast the dimension side — at crawl scale the lookup table is tiny
    relative to the stream."""
    name = str(st.get("TableName", st.get("Table", "")))
    key = str(st.get("JoinKey", st.column))
    dim = ctx.tables.get(name) or ctx.spark.table(name)
    if ORD in dim.columns:
        dim = dim.drop(ORD)
    dup = [c for c in dim.columns if c in df.columns and c != key]
    dim = dim.drop(*dup)
    cond = F.col(f"__l__.{st.column}") == F.col(f"__r__.{key}")
    out = df.alias("__l__").join(F.broadcast(dim.alias("__r__")), cond, "left")
    if key != st.column and key in out.columns:
        out = out.drop(F.col(f"__r__.{key}"))
    return out


@register("SaveFileEX")
def save_file_ex(ctx: CompileContext, df: DataFrame, st: Stage) -> DataFrame:
    """The reference downloads each URL to a templated filesystem path
    (reference etl.py:697-708, used by sample.py:10 for the picture crawl).
    Filesystem-per-image does not survive 10^10 scale: our sink fetches
    bytes in Arrow batches and appends (url, save_path, bytes) to a parquet
    dir; the real image pipeline (decode/phash/MERGE into the image table)
    lives in crawl/frontier.py (SparkCrawler.run_round, image path)."""
    if not ctx.execute:
        return df
    save_tpl = str(st.get("SavePath", ""))
    url_col = st.column
    fetch_bytes = getattr(ctx, "byte_fetcher", None)

    def sink(out: DataFrame) -> None:
        if fetch_bytes is None:
            raise RuntimeError("CompileContext.byte_fetcher not configured")

        @pandas_udf("binary")
        def _fetch(urls: pd.Series) -> pd.Series:
            return pd.Series(fetch_bytes(list(urls)))

        path_expr: Column = F.lit(save_tpl)
        for m in re.findall(r"\[(\w+)\]", save_tpl):
            path_expr = F.replace(path_expr, F.lit(f"[{m}]"), F.col(m).cast("string"))
        res = out.select(
            F.col(url_col).alias("url"),
            path_expr.alias("save_path"),
            _fetch(F.col(url_col)).alias("bytes"),
        )
        res.write.mode("append").parquet(os.path.join(ctx.files_root, "saved_files"))

    ctx.sinks.append(("SaveFileEX", sink))
    return df


@register("BfsGE")
def bfs_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """BFS crawl frontier (reference etl.py:658-659 stub). The real
    implementation is the iterative frontier loop in crawl/frontier.py —
    a multi-round batch job, not a single DataFrame expression. Here we
    surface the crawl result table so pipelines can consume it."""
    name = str(st.get("Table", "frontier"))

    def make_source() -> DataFrame:
        src = ctx.tables.get(name)
        if src is None:
            raise RuntimeError(
                "BfsGE consumes a completed crawl: run crawl.frontier.crawl() "
                f"and register its result as table {name!r}"
            )
        if ORD not in src.columns:
            src = src.withColumn(ORD, F.array(F.monotonically_increasing_id()))
        return src

    return apply_generator(ctx, df, st, make_source)
