"""Text-analysis operators for training-data pipelines (task brief: lang-id,
quality scoring, token counting, document fingerprinting) — all pure Column
expressions (JVM-side, codegen, pushdown-friendly); zero Python in the row
path.

Where a deterministic hash must agree with an external oracle (DuckDB), we
use md5-prefix → integer, available identically on both engines; the
engine-internal fast path would be xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (public knowledge; heuristic lang-id
# by stopword hit-rate, the classic n-gram/stopword approach).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "zu"],
}

TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"  # BPE-ish: words + punct marks


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count + punctuation-aware regex token count would
    differ; this is the regex ('BPE-ish') count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_RE))


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_hits(col: Column | str, lang: str) -> Column:
    ws = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws, lambda w: F.array_contains(sw, F.lower(w))))


def lang_id(col: Column | str) -> Column:
    """argmax over per-language stopword hit-rates; 'und' when nothing hits.
    (The reference's NlpTF is an empty stub, etl.py:641-642.)"""
    ws = tokens(col)
    n = F.greatest(F.size(ws), F.lit(1))
    scores = [(lang, stopword_hits(col, lang) / n) for lang in STOPWORDS]
    best_score: Column = F.lit(0.0)
    for _, s in scores:
        best_score = F.greatest(best_score, s)
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def frac4(p: Column, q: Column, cap: bool = False) -> Column:
    """Half-up 4-dp fraction p/q (non-negative integers, q > 0) as a
    DOUBLE that is BIT-IDENTICAL across engines BY CONSTRUCTION.

    Rounding a double with ``ROUND(x, 4)`` is NOT portable — Spark rounds
    the exact binary value HALF_UP via BigDecimal while other engines can
    disagree at one-ulp boundaries, and the driver's value hash is
    representation-sensitive (the round-3 `text_suite` hash miss). So the
    rounding here happens in INTEGER space: basis points
    ``bp = floor((p*20000 + q) / (2q))`` (the textbook half-up rounding of
    ``p/q`` at 4 dp), then one IEEE division ``bp / 10000.0`` — identical
    operands on every IEEE-754 engine give identical result bits. NULL
    inputs (e.g. a left-join miss) yield 0.0, matching COALESCE(x, 0).

    The intermediate long division is exact: ``num - pmod(num, den)`` is an
    exact multiple of ``den``, both < 2^53, so the double quotient is the
    true integer. ``cap`` clamps to 1.0 (for upper-bound fractions that
    can exceed 1)."""
    num = p.cast("long") * F.lit(20000) + q.cast("long")
    den = q.cast("long") * F.lit(2)
    bp = ((num - F.pmod(num, den)) / den).cast("long")
    # coalesce BEFORE least: both Spark's and DuckDB's least() skip nulls,
    # so a null ratio would otherwise cap to 1.0 instead of scoring 0
    bp = F.coalesce(bp, F.lit(0))
    if cap:
        bp = F.least(bp, F.lit(10000))
    return bp.cast("double") / F.lit(10000.0)


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword
    presence — the standard cheap pre-filter for web-scale corpora.

    Emitted as DECIMAL(10,4) via pure integer arithmetic (see frac4):
    quality = (n_alpha/n_chars + len_ok + sw_ok) / 3 with len_ok ∈ {1, .5}
    and sw_ok ∈ {1, .6} becomes (10·n_alpha + (len10+sw10)·nc) / (30·nc);
    the stopword gate hits/words > 0.02 is exactly 50·hits > words."""
    c = F.col(col) if isinstance(col, str) else col
    nc = F.greatest(F.length(c), F.lit(1))
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_words = F.size(tokens(c))
    len10 = F.when((n_words >= 20) & (n_words <= 1000), F.lit(10)).otherwise(F.lit(5))
    sw10 = F.when(
        stopword_hits(c, "en") * 50 > F.greatest(n_words, F.lit(1)), F.lit(10)
    ).otherwise(F.lit(6))
    p = n_alpha * 10 + (len10 + sw10) * nc
    return frac4(p, nc * 30)


def word_hash32(w: Column) -> Column:
    """32-bit deterministic word hash shared with SQL oracles:
    int(md5(w)[:8], 16)."""
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")


FP_MOD = (1 << 31) - 1


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling (polynomial) hash over words, mod 2^31-1 —
    a document fingerprint that, unlike set-hashes, distinguishes
    permutations."""
    ws = tokens(col)
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_hash32(w)) % F.lit(FP_MOD),
    )


# --- PII detection / redaction -------------------------------------------
# Web-scale training corpora are scrubbed of personally identifiable
# information before use; these are the standard cheap regex classes, kept
# to a syntax subset that behaves identically under Java regex (Spark JVM)
# and Python `re` so the differential test is exact. All pure Column
# expressions — zero Python in the row path, codegen-friendly.
PII_PATTERNS = [
    # order matters: longer/more-specific classes first so e.g. a credit
    # card is not partially consumed as phone digits.
    ("credit_card", r"\b\d{4}([- ])\d{4}\1\d{4}\1\d{4}\b", "[CC]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_counts(col: Column | str) -> Column:
    """struct<credit_card:int, ssn:int, phone:int, email:int, ipv4:int> of
    per-class match counts. Counts overlap-free per class but classes are
    counted independently (an IPv4 inside an email would count for both);
    redact_pii resolves precedence by replacement order instead."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[F.regexp_count(c, F.lit(pat)).alias(name) for name, pat, _ in PII_PATTERNS]
    )


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each PII class with its placeholder token, applied in
    PII_PATTERNS order (most-specific first) so one span is consumed by
    exactly one class."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat, token in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        c = F.regexp_replace(c, pat, token)
    return c


# --- repetition quality signals (Gopher rules) -----------------------------
# The standard public web-corpus repetition filters (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Appendix A1.1): documents whose
# content is dominated by repeated lines or n-grams are boilerplate/spam
# and get filtered before training. All shapes below are explode +
# map-side-combinable hash aggregates keyed by (doc, line|gram) — the
# shuffle carries one row per DISTINCT line/gram per doc, never the raw
# text twice, so the pass scales like the n-gram dedup miners.


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    top_ns: list[int] | tuple[int, ...] | None = None,
    dup_ns: list[int] | tuple[int, ...] | None = None,
) -> DataFrame:
    """Per-document repetition signals → (id, n_lines, dup_line_frac,
    dup_line_char_frac, top_ngram_char_frac, dup_ngram_char_frac).

    Definitions (Gopher A1.1 conventions, simplified where noted):
      * a "line" is a non-empty trimmed '\\n' segment;
      * dup_line_frac        = lines beyond the first occurrence / lines;
      * dup_line_char_frac   = chars in those repeat occurrences / chars in
                               all lines;
      * top_ngram_char_frac  = chars covered by the single most frequent
                               word ``top_n``-gram / doc chars;
      * dup_ngram_char_frac  = chars covered by all ``dup_n``-grams seen
                               more than once / doc chars (not
                               overlap-adjusted — the cheap upper bound).

    Pass ``top_ns``/``dup_ns`` instead for the FULL Gopher A1.1 rule set
    (top-n for n∈{2,3,4}, dup-n for n∈{5..10}): one extra explode+agg
    branch per n, columns named ``top_{n}gram_char_frac`` /
    ``dup_{n}gram_char_frac``. Every branch is a map-side-combinable
    hash aggregate keyed by (doc, gram) — the shuffle carries one row per
    DISTINCT gram per doc per n, so adding n's scales linearly in
    shuffled bytes, never quadratically.

    Fractions are exact half-up 4-dp DECIMAL(10,4) (frac4 — the driver
    hash canonicalization is representation-sensitive; ROUND(double,4) is
    not portable across engines). Docs with no lines/grams score 0.0000.
    """
    from etlpy_spark.operators.dedup import _spread

    legacy = top_ns is None and dup_ns is None
    tops = [top_n] if top_ns is None else list(top_ns)
    dups = [dup_n] if dup_ns is None else list(dup_ns)

    # _spread: a small parquet scan is 1-2 partitions, which would run
    # every explode/gram evaluation serially; no-op at real scale
    base = _spread(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    ).withColumn("_nchars", F.length("_t"))

    lines = (
        base.select("_id", F.explode(F.split("_t", "\n")).alias("_raw"))
        .select("_id", F.trim("_raw").alias("_line"))
        .where(F.length("_line") > 0)
    )
    lagg = (
        lines.groupBy("_id", "_line")
        .agg(F.count("*").alias("_cnt"))
        .groupBy("_id")
        .agg(
            F.sum("_cnt").alias("_nl"),
            F.count("*").alias("_ndl"),
            F.sum(F.col("_cnt") * F.length("_line")).alias("_lch"),
            F.sum((F.col("_cnt") - 1) * F.length("_line")).alias("_dlch"),
        )
    )

    # ALL n's share one (doc, n, gram) shuffle + one (doc, n) aggregate +
    # one pivot: 2 shuffles instead of one per n and ONE broadcast join
    # back instead of 9 — measured 2.05 → 1.7 s at sf0.1 with the full
    # A1.1 set, identical output frame. (r2 measured STRING-tag fusion
    # losing 50% — the per-gram tag concat was the cost; an int n column
    # in the grouping key costs nothing.) The token array is split once
    # per branch in its own projection — nesting the split inside the
    # gram transform re-evaluates it per element (the _shingle_hash_rows
    # pitfall, dedup.py).
    toks = base.select("_id", F.split(F.trim("_t"), r"\s+").alias("_ws"))
    all_ns = list(dict.fromkeys(list(tops) + list(dups)))

    def branch(n: int) -> DataFrame:
        k = F.size(F.col("_ws")) - F.lit(n - 1)
        grams = F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("_ws"), i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return toks.select("_id", F.lit(n).alias("_n"), F.explode(grams).alias("_g"))

    allg = branch(all_ns[0])
    for n in all_ns[1:]:
        allg = allg.unionByName(branch(n))
    per_n = (
        allg.groupBy("_id", "_n", "_g")
        .agg(F.count("*").alias("_cnt"))
        .groupBy("_id", "_n")
        .agg(
            F.max(F.col("_cnt") * F.length("_g")).alias("_topch"),
            F.sum(
                F.when(F.col("_cnt") > 1, F.col("_cnt") * F.length("_g"))
                .otherwise(F.lit(0))
            ).alias("_dupch"),
        )
    )
    piv = per_n.groupBy("_id").pivot("_n", all_ns).agg(
        F.first("_topch").alias("top"), F.first("_dupch").alias("dup")
    )

    out = base.select("_id", "_nchars").join(lagg, "_id", "left").join(piv, "_id", "left")
    nch = F.greatest("_nchars", F.lit(1))
    proj = [
        F.col("_id").alias(id_col),
        F.coalesce("_nl", F.lit(0)).cast("long").alias("n_lines"),
        frac4(F.col("_nl") - F.col("_ndl"), F.col("_nl")).alias("dup_line_frac"),
        frac4(F.col("_dlch"), F.col("_lch")).alias("dup_line_char_frac"),
    ]
    for n in tops:
        name = "top_ngram_char_frac" if legacy else f"top_{n}gram_char_frac"
        proj.append(frac4(F.coalesce(f"{n}_top", F.lit(0)), nch, cap=True).alias(name))
    for n in dups:
        name = "dup_ngram_char_frac" if legacy else f"dup_{n}gram_char_frac"
        proj.append(frac4(F.coalesce(f"{n}_dup", F.lit(0)), nch, cap=True).alias(name))
    return out.select(*proj)


# --- C4 page/line heuristics ------------------------------------------------
# The published C4 cleaning rules (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning...", public paper, section 2.2) re-expressed
# as pure Column expressions: line-level — keep lines that end in terminal
# punctuation, have >= 5 words, and don't mention javascript; page-level —
# drop pages with < 3 surviving lines, any "lorem ipsum", or a "{" (code).
# The bad-words-list rule is intentionally absent (external data).


def c4_clean(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds: ``c4_text`` (surviving lines re-joined), ``c4_lines_kept``,
    and ``c4_keep`` (the page gate). One materialized line-array
    projection, then HOF filters over it — the lines array is computed
    ONCE in its own projection (the nested-HOF re-evaluation pitfall;
    see repetition_metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = df.withColumn("_lines", F.split(c, "\n"))
    line = lambda l: F.trim(l)  # noqa: E731
    kept_expr = F.filter(
        F.col("_lines"),
        lambda l: line(l).rlike(r'[.!?"\u2019\u201d]$')
        & (F.size(F.split(line(l), r"\s+")) >= 5)
        & ~F.lower(l).contains("javascript"),
    )
    kept = lines.withColumn("_kept", kept_expr)
    lc = F.lower(c)
    return (
        kept.withColumn("c4_text", F.array_join("_kept", "\n"))
        .withColumn("c4_lines_kept", F.size("_kept"))
        .withColumn(
            "c4_keep",
            (F.size("_kept") >= 3)
            & ~lc.contains("lorem ipsum")
            & ~c.contains("{"),
        )
        .drop("_lines", "_kept")
    )


def c4_clean_py(text: str) -> tuple[str, int, bool]:
    """Serial replica of c4_clean for differential tests."""
    import re as _re

    kept = [
        line
        for line in text.split("\n")
        if _re.search(r'[.!?"\u2019\u201d]$', line.strip())
        and len(_re.split(r"\s+", line.strip())) >= 5
        and "javascript" not in line.lower()
    ]
    keep = (
        len(kept) >= 3
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return "\n".join(kept), len(kept), keep


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    return (
        df.withColumn("lang_pred", lang_id(col))
        .withColumn("quality", quality_score(col))
        .withColumn("n_tokens", token_count(col))
        .withColumn("fp", fingerprint(col))
    )
