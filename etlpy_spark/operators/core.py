"""Core operator builders — the pure-Column-expression set.

Each builder compiles one reference tool (cited per function) into native
Spark expressions so the whole stage stays inside whole-stage codegen:
no Python in the row path, Catalyst free to push/prune/fold.

Shared semantics implemented here:
  - one-to-one Transformer with absent ``Column`` is a pass-through
    (reference etl.py:65-67) → plan-time no-op when the column is not in
    the schema; per-row raggedness maps to NULL (absent ≡ NULL).
  - Filters drop rows whose ``Column`` is missing/NULL regardless of
    ``Revert`` — except NullFT (reference etl.py:93-104).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlpy_spark.functions.expr import attr_expr, compile_python_script, is_col_ref
from etlpy_spark.plans.compiler import (
    ORD,
    CompileContext,
    apply_generator,
    register,
    seq_over_ord,
    with_ord,
)
from etlpy_spark.plans.spec import Stage


def _gate(df: DataFrame, st: Stage) -> bool:
    """True when the one-to-one transformer should pass rows through
    untouched because Column is absent from the schema (etl.py:65-67)."""
    return st.column != "" and st.column not in df.columns


def _set(df: DataFrame, st: Stage, expr: Column) -> DataFrame:
    """Result lands in NewColumn if set, else overwrites Column
    (reference etl.py:70-71 / etl.py:213-217 setValue)."""
    return df.withColumn(st.target, expr)


def _filter(df: DataFrame, st: Stage, pred: Column, null_ft: bool = False) -> DataFrame:
    col = F.col(st.column)
    if st.column not in df.columns:
        # missing column: every row dropped (etl.py:96-99), except NullFT
        # where filter(None) is evaluated (None → False → Revert applies).
        if not null_ft:
            return df.limit(0)
        pred = F.lit(False)
        keep = ~pred if st.get("Revert", False) else pred
        return df.filter(keep)
    if null_ft:
        keep = ~pred if st.get("Revert", False) else pred
        return df.filter(keep)
    keep = ~pred if st.get("Revert", False) else pred
    return df.filter(col.isNotNull() & keep)


# ---------------------------------------------------------------------------
# Generators


@register("RangeGE")
def range_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """Numeric range rows (reference etl.py:525-537). Uncorrelated →
    ``spark.range`` (parallel, no driver materialization); correlated bounds
    (``MaxValue='[page]'``, reference project.xml:77) with MergeType=Cross →
    lateral ``explode(sequence(...))`` so pagination fan-out happens
    executor-side with no shuffle."""
    mn, mx, iv = st.get("MinValue", 1), st.get("MaxValue", 1), st.get("Interval", 1)
    correlated = any(is_col_ref(v) for v in (mn, mx, iv))

    def make_source() -> DataFrame:
        lo, hi, step = int(mn), int(mx), int(iv)
        src = ctx.spark.range(lo, hi, step, numPartitions=ctx.parallelism)
        src = src.select(F.col("id").alias(st.column))
        return with_ord(src, ((F.col(st.column) - F.lit(lo)) / F.lit(step)).cast("long"))

    def make_lateral(parent: DataFrame) -> DataFrame:
        lo = attr_expr(mn, "long")
        hi = attr_expr(mx, "long")
        step = attr_expr(iv, "long")
        # python range() excludes the stop bound; F.sequence includes it.
        seq = F.when(hi > lo, F.sequence(lo, hi - F.lit(1), step)).otherwise(
            F.array().cast("array<long>")
        )
        out = parent.select(
            *[c for c in parent.columns if c != st.column],
            F.posexplode(seq).alias("__pos__", st.column),
        )
        return out.withColumn(
            ORD, F.concat(F.col(ORD), F.array(F.col("__pos__").cast("long")))
        ).drop("__pos__")

    if correlated:
        if df is None:
            raise ValueError("correlated RangeGE bounds need an upstream stream")
        return make_lateral(df)
    return apply_generator(ctx, df, st, make_source, make_lateral)


@register("TextGE")
def text_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """One row per line of a literal text block (reference etl.py:594-602)."""
    lines = [r.strip() for r in str(st.get("Content", "")).split("\n")]
    pos = int(st.get("Position", 0) or 0)

    def make_source() -> DataFrame:
        rows = [(i - pos, lines[i]) for i in range(pos, len(lines))]
        src = ctx.spark.createDataFrame(rows, schema=f"__i__ long, {st.column} string")
        return with_ord(src, "__i__").drop("__i__")

    return apply_generator(ctx, df, st, make_source)


@register("TableGE")
def table_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """Read a named side table (reference etl.py:690-691 stub; semantics from
    TableEX etl.py:609-620)."""
    name = st.get("Table", st.get("TableName", "Table"))

    def make_source() -> DataFrame:
        src = ctx.tables.get(name)
        if src is None:
            src = ctx.spark.table(name)
        if ORD not in src.columns:
            src = src.withColumn(
                ORD, F.array(F.monotonically_increasing_id())
            )
        return src

    return apply_generator(ctx, df, st, make_source)


@register("FolderGE")
def folder_ge(ctx: CompileContext, df: DataFrame | None, st: Stage) -> DataFrame:
    """Enumerate files in a folder (reference etl.py:687-688 stub) —
    at scale this is ``spark.read.format('binaryFile')``; here a listing."""
    import os

    folder = st.get("Folder", st.get("Path", ctx.files_root))
    col = st.column or "path"

    def make_source() -> DataFrame:
        names = sorted(os.listdir(folder))
        rows = [(i, os.path.join(folder, n)) for i, n in enumerate(names)]
        src = ctx.spark.createDataFrame(rows, schema=f"__i__ long, {col} string")
        return with_ord(src, "__i__").drop("__i__")

    return apply_generator(ctx, df, st, make_source)


# ---------------------------------------------------------------------------
# Filters


@register("NullFT")
def null_ft(ctx, df, st):
    """Drop None/blank values (reference etl.py:249-256). Unlike every other
    filter, missing/None is *evaluated*, not auto-dropped (etl.py:98)."""
    if st.column not in df.columns:
        pred = F.lit(False)
    else:
        c = F.col(st.column)
        dt = dict(df.dtypes).get(st.column, "string")
        pred = c.isNotNull() & (F.trim(c.cast("string")) != "") if dt == "string" else c.isNotNull()
    return _filter(df, st, pred, null_ft=True)


@register("RegexFT")
def regex_ft(ctx, df, st):
    """Keep rows with >= Count regex matches (reference etl.py:219-230;
    NB the reference's init() resets Count to 1 at runtime)."""
    pat = st.get("Script", "")
    cnt = int(st.get("Count", 1) or 1)
    pred = F.regexp_count(F.col(st.column).cast("string"), F.lit(pat)) >= F.lit(cnt)
    return _filter(df, st, pred)


@register("RangeFT")
def range_ft(ctx, df, st):
    """Min <= float(value) <= Max (reference etl.py:232-236)."""
    v = F.col(st.column).cast("double")
    pred = v.between(F.lit(float(st.get("Min", 0))), F.lit(float(st.get("Max", 0))))
    return _filter(df, st, pred & v.isNotNull())


@register("NumRangeFT")
def num_range_ft(ctx, df, st):
    return range_ft(ctx, df, st)


@register("RepeatFT")
def repeat_ft(ctx, df, st):
    """Stateful keep-first dedup over the stream (reference etl.py:238-247) —
    the reference's URL-seen set. Keep-first is order-defined, so: min __ord__
    per key wins. One shuffle on the key; at crawl scale the cross-round
    variant is the sharded seen-set in crawl/seen.py."""
    c = F.col(st.column)
    base = df.filter(c.isNotNull()) if st.column in df.columns else df.limit(0)
    if st.get("Revert", False):
        # keep only re-occurrences (rare; mirror of the predicate)
        w = Window.partitionBy(c).orderBy(F.col(ORD))
        return base.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") > 1).drop("__rk__")
    w = Window.partitionBy(c).orderBy(F.col(ORD))
    return base.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") == 1).drop("__rk__")


# ---------------------------------------------------------------------------
# Projection / column ops


@register("AddNewTF")
def add_new_tf(ctx, df, st):
    """Constant column (reference etl.py:259-262). NB reference semantics:
    the stage only fires when ``Column`` names an existing column
    (etl.py:65-67 gate); with Column='' it is a no-op. We honor that when
    Column is set but missing; with Column='' we implement the evident
    intent (add the constant) since a permanent no-op has no Spark value."""
    if st.column and st.column not in df.columns:
        return df
    target = st.target or "NewValue"
    return df.withColumn(target, F.lit(st.get("NewValue", "")))


@register("AutoIndexTF")
def auto_index_tf(ctx, df, st):
    """1-based stream-order row index (reference etl.py:265-271). Contiguity
    + order parity require row_number over the order vector (a global sort),
    not monotonically_increasing_id."""
    if _gate(df, st):
        return df
    return _set(df, st, seq_over_ord(df).cast("long"))


@register("RenameTF")
def rename_tf(ctx, df, st):
    """Rename, or drop when NewColumn is empty (reference etl.py:274-285)."""
    if st.column not in df.columns:
        return df
    if st.new_column == "":
        return df.drop(st.column)
    return df.withColumnRenamed(st.column, st.new_column)


@register("DeleteTF")
def delete_tf(ctx, df, st):
    """Drop column (reference etl.py:287-293)."""
    return df.drop(st.column)


@register("DictTF")
def dict_tf(ctx, df, st):
    """Lookup mapping (reference etl.py:661-662 stub). ``Mapping`` attr is
    ``k1:v1,k2:v2``; unmapped values pass through. Compiles to a literal map
    lookup — broadcast-join territory only for big dims (JoinDBTF)."""
    if _gate(df, st):
        return df
    mapping = st.get("Mapping", "")
    pairs: list[Column] = []
    for part in str(mapping).split(","):
        if ":" in part:
            k, _, v = part.partition(":")
            pairs += [F.lit(k.strip()), F.lit(v.strip())]
    m = F.create_map(*pairs) if pairs else F.create_map()
    looked = F.element_at(m, F.col(st.column).cast("string"))
    return _set(df, st, F.coalesce(looked, F.col(st.column).cast("string")))


# ---------------------------------------------------------------------------
# Scalar string transformers


@register("TrimTF")
def trim_tf(ctx, df, st):
    """Python str.strip() strips all whitespace (reference etl.py:402-408);
    Spark trim() only strips spaces, so regexp both ends."""
    if _gate(df, st):
        return df
    return _set(df, st, F.regexp_replace(F.col(st.column), r"^\s+|\s+$", ""))


@register("RegexTF")
def regex_tf(ctx, df, st):
    """Extract Index-th regex match; '' when out of range; first group when
    the pattern has groups (reference etl.py:350-366)."""
    if _gate(df, st):
        return df
    pat = str(st.get("Script", ""))
    idx = int(st.get("Index", 0) or 0)
    group = 1 if re.compile(pat).groups >= 1 else 0
    if idx < 0:
        return _set(df, st, F.lit(""))
    arr = F.regexp_extract_all(F.col(st.column).cast("string"), F.lit(pat), F.lit(group))
    val = F.when(F.size(arr) > idx, F.element_at(arr, idx + 1)).otherwise(F.lit(""))
    val = F.when(F.col(st.column).isNull(), F.lit(None)).otherwise(val)
    return _set(df, st, val)


@register("ReReplaceTF")
def re_replace_tf(ctx, df, st):
    """Regex substitution (reference etl.py:368-371)."""
    if _gate(df, st):
        return df
    return _set(
        df,
        st,
        F.regexp_replace(F.col(st.column), str(st.get("Script", "")), str(st.get("ReplaceText", ""))),
    )


@register("NumberTF")
def number_tf(ctx, df, st):
    """First number extracted then int-cast (reference etl.py:373-382;
    default script ``(-?\\d+)(\\.\\d+)?`` per project.xml:36 — two groups, so
    the integer-part group is taken)."""
    if _gate(df, st):
        return df
    pat = str(st.get("Script", r"(-?\d+)(\.\d+)?"))
    group = 1 if re.compile(pat).groups >= 1 else 0
    idx = int(st.get("Index", 0) or 0)
    arr = F.regexp_extract_all(F.col(st.column).cast("string"), F.lit(pat), F.lit(group))
    val = F.when(F.size(arr) > idx, F.element_at(arr, idx + 1)).otherwise(F.lit(None))
    return _set(df, st, val.cast("long"))


@register("SplitTF")
def split_tf(ctx, df, st):
    """Split by literal char, Index-th piece, '' out of range
    (reference etl.py:384-400)."""
    if _gate(df, st):
        return df
    chars = str(st.get("SplitChar", "")).split(" ")
    sp = chars[0]
    if sp == "":
        return df  # reference returns data unchanged
    idx = int(st.get("Index", 0) or 0)
    parts = F.split(F.col(st.column), re.escape(sp), -1)
    val = F.when(F.size(parts) > idx, F.element_at(parts, idx + 1)).otherwise(F.lit(""))
    val = F.when(F.col(st.column).isNull(), F.lit(None)).otherwise(val)
    return _set(df, st, val)


@register("RegexSplitTF")
def regex_split_tf(ctx, df, st):
    """Regex split, Index-th piece (optionally from the back), original value
    when out of range (reference etl.py:316-329)."""
    if _gate(df, st):
        return df
    pat = str(st.get("Regex", st.get("Script", "")))
    idx = int(st.get("Index", 0) or 0)
    c = F.col(st.column)
    parts = F.split(c, pat, -1)
    n = F.size(parts)
    if st.get("FromBack", False):
        pos = n - F.lit(idx)  # 1-based element_at of items[len-idx-1]
        val = F.when((n > idx) & (pos >= 1), F.element_at(parts, pos)).otherwise(c)
    else:
        val = F.when(n > idx, F.element_at(parts, idx + 1)).otherwise(c)
    return _set(df, st, val)


@register("StrExtractTF")
def str_extract_tf(ctx, df, st):
    """Substring between Former and End markers (reference etl.py:410-429);
    End is searched from Former's own index, inclusive flags via
    HaveStartEnd. None (NULL) when either marker is absent."""
    if _gate(df, st):
        return df
    former = str(st.get("Former", ""))
    end = str(st.get("End", ""))
    inclusive = bool(st.get("HaveStartEnd", False))
    c = F.col(st.column)
    stpos = F.locate(former, c)  # 1-based, 0 when absent
    # End is searched from Former's index (etl.py:422): locate() only takes a
    # literal start, so search the suffix and rebase.
    en_rel = F.locate(end, c.substr(stpos, F.length(c)))
    enpos = F.when(en_rel == 0, F.lit(0)).otherwise(stpos + en_rel - 1)
    if inclusive:
        a = stpos
        b = enpos + F.lit(len(end))
    else:
        a = stpos + F.lit(len(former))
        b = enpos
    length = F.greatest(b - a, F.lit(0))
    val = F.when((stpos == 0) | (enpos == 0), F.lit(None)).otherwise(c.substr(a, length))
    return _set(df, st, val)


@register("MergeTF")
def merge_tf(ctx, df, st):
    """Format-string templating across columns — the crawler's URL
    constructor (reference etl.py:331-345; project.xml:32,70,78). ``{0}`` =
    Column ('' when absent), ``{1..}`` = MergeWith columns. Sequential
    literal replace, all occurrences, exactly like the reference loop."""
    fmt = str(st.get("Format", "{0}"))
    merge_with = str(st.get("MergeWith", "") or "")
    cols: list[Column] = []
    if st.column and st.column in df.columns:
        cols.append(F.coalesce(F.col(st.column).cast("string"), F.lit("")))
    else:
        cols.append(F.lit(""))
    for name in ([] if merge_with == "" else merge_with.split(" ")):
        cols.append(F.coalesce(F.col(name).cast("string"), F.lit("")))
    out: Column = F.lit(fmt)
    for i, c in enumerate(cols):
        out = F.replace(out, F.lit("{%d}" % i), c)
    return df.withColumn(st.target, out)


@register("HtmlTF")
def html_tf(ctx, df, st):
    """HTML entity escape/unescape (reference etl.py:295-301). No Spark
    builtin covers HTML5 entities → Arrow-batched pandas UDF."""
    if _gate(df, st):
        return df
    import html as _html

    from pyspark.sql.functions import pandas_udf

    encode = st.get("ConvertType", "Decode") == "Encode"

    @pandas_udf("string")
    def _conv(s: pd.Series) -> pd.Series:
        fn = _html.escape if encode else _html.unescape
        return s.map(lambda v: None if v is None else fn(v))

    return _set(df, st, _conv(F.col(st.column)))


@register("UrlTF")
def url_tf(ctx, df, st):
    """URL percent-encode/decode (reference etl.py:304-313). The reference
    uses urllib.parse.quote/unquote; Spark's url_encode is form-encoding
    (space→'+'), so parity requires the urllib semantics in a pandas UDF."""
    if _gate(df, st):
        return df
    import urllib.parse as _up

    from pyspark.sql.functions import pandas_udf

    encode = st.get("ConvertType", "Decode") == "Encode"

    @pandas_udf("string")
    def _conv(s: pd.Series) -> pd.Series:
        fn = (lambda v: _up.quote(v.encode("utf-8"))) if encode else _up.unquote
        return s.map(lambda v: None if v is None else fn(v))

    return _set(df, st, _conv(F.col(st.column)))


@register("PythonTF")
def python_tf(ctx, df, st):
    """Arbitrary Python expression over the row (reference etl.py:431-442:
    ``eval(Script, {'value': row[Column]}, row)``). The safe subset compiles
    to native Column expressions (stays in codegen, pushable); anything else
    falls back to a per-batch pandas UDF evaluating with Series operands —
    still Arrow-vectorized for arithmetic-style scripts."""
    script = str(st.get("Script", "value"))
    try:
        expr = compile_python_script(script, value_col=st.column or None)
        return df.withColumn(st.target, expr)
    except Exception:
        pass

    from pyspark.sql.functions import pandas_udf

    cols = [c for c in df.columns if c != ORD]
    value_col = st.column

    @pandas_udf("string")
    def _eval(struct: pd.DataFrame) -> pd.Series:
        env = {c: struct[c] for c in struct.columns}
        if value_col and value_col in struct.columns:
            env["value"] = struct[value_col]
        try:  # vectorized eval over Series operands
            res = eval(script, {"__builtins__": {}}, env)  # noqa: S307
            if not hasattr(res, "__len__") or len(res) != len(struct):
                raise TypeError
            return pd.Series(res).astype("string")
        except Exception:  # row-at-a-time last resort
            import warnings

            warnings.warn(
                f"PythonTF script {script!r} is not vectorizable; falling back "
                "to row-at-a-time eval — this will not scale, rewrite the "
                "script in the compilable subset (functions/expr.py)",
                RuntimeWarning,
                stacklevel=2,
            )
            out = []
            for _, row in struct.iterrows():
                e = dict(row)
                e["value"] = row.get(value_col)
                out.append(str(eval(script, {"__builtins__": {}}, e)))  # noqa: S307
            return pd.Series(out, dtype="string")

    return df.withColumn(st.target, _eval(F.struct(*[F.col(c) for c in cols])))


@register("Time2StrTF")
def time2str_tf(ctx, df, st):
    """Time→string (reference etl.py:654-655 stub; intended date_format)."""
    if _gate(df, st):
        return df
    fmt = str(st.get("Format", "yyyy-MM-dd"))
    return _set(df, st, F.date_format(F.col(st.column), fmt))


@register("FileExistFT")
def file_exist_ft(ctx, df, st):
    """Path existence as 'True'/'False' strings (reference etl.py:664-671 —
    declared a Transformer despite the FT name)."""
    if _gate(df, st):
        return df
    import os

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _exists(s: pd.Series) -> pd.Series:
        return s.map(lambda v: str(os.path.exists(v)) if v is not None else None)

    return _set(df, st, _exists(F.col(st.column)))


@register("RangeTF")
def range_tf(ctx, df, st):
    """Offset/limit over the stream (reference etl.py:539-554; the
    reference's skip branch is buggy — we implement the intended
    skip-then-take)."""
    skip = int(st.get("Skip", 0) or 0)
    take = int(st.get("Take", 9999999) or 9999999)
    rn = seq_over_ord(df)
    return (
        df.withColumn("__rn__", rn)
        .filter((F.col("__rn__") > skip) & (F.col("__rn__") <= skip + take))
        .drop("__rn__")
    )


@register("RepeatTF")
def repeat_tf(ctx, df, st):
    """Repeat each row RepeatCount times (reference etl.py:649-650 stub;
    attr from project.xml RangeGE RepeatCount)."""
    n = int(st.get("RepeatCount", 1) or 1)
    out = df.select(
        *[c for c in df.columns],
        F.posexplode(F.array_repeat(F.lit(1), n)).alias("__pos__", "__one__"),
    )
    return (
        out.withColumn(ORD, F.concat(F.col(ORD), F.array(F.col("__pos__").cast("long"))))
        .drop("__pos__", "__one__")
    )


@register("MergeRepeatTF")
def merge_repeat_tf(ctx, df, st):
    """Merge duplicate rows by Column (reference etl.py:673-674 stub):
    keep-first of other columns in stream order + occurrence count."""
    key = st.column
    others = [c for c in df.columns if c not in (key, ORD)]
    aggs = [F.min_by(F.col(c), F.col(ORD)).alias(c) for c in others]
    aggs.append(F.count(F.lit(1)).alias(st.new_column or "count"))
    aggs.append(F.min(F.col(ORD)).alias(ORD))
    return df.groupBy(key).agg(*aggs)


@register("ToListTF")
def to_list_tf(ctx, df, st):
    """Map/reduce stage-boundary marker (reference etl.py:504-506, consumed
    by parallel_map/parallel_reduce etl.py:919-935). In Spark terms the
    boundary is a repartition: upstream seeds spread across the cluster
    before the heavy per-seed suffix runs."""
    return df.repartition(ctx.parallelism)


@register("DelayTF")
def delay_tf(ctx, df, st):
    """Politeness delay marker (reference etl.py:679-680 stub; DelayTime on
    every module project.xml:9). A per-row sleep is wrong on a cluster —
    politeness is enforced per host-bucket by the crawl scheduler
    (crawl/frontier.py, per-host budget + salted fetch buckets); in a pure
    ETL plan this is a no-op."""
    return df


@register("TransTF")
def trans_tf(ctx, df, st):
    """Translation stub (reference etl.py:644-645) — identity."""
    return df


@register("NlpTF")
def nlp_tf(ctx, df, st):
    """NLP stub (reference etl.py:641-642) — see operators/text.py for the
    real text-analysis suite (lang-id, quality, tokens, fingerprint)."""
    return df
