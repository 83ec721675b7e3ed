"""One-call training-corpus preparation pipeline.

The canonical large-scale LLM data-prep flow (task brief: dedup /
quality / PII / sampling / packing as first-class engine components),
composed from the individually scale-audited primitives:

    annotate (lang-id, quality, tokens, Gopher repetition signals)
      -> filter (quality floor + repetition ceilings)
      -> redact PII
      -> near-dup dedup (LSH mine -> cluster -> keep one per cluster)
      -> stratified sample (deterministic hash gate)
      -> context-window packing (FFD)

Every stage is a DataFrame -> DataFrame transformation with an audited
shuffle shape (see PLANS.md / SURVEY.md LLM-ops table); this module adds
no new distributed machinery, only the composition, so the 100 TB
characteristics are exactly those of the underlying operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etlpy_spark.operators import text as tx
from etlpy_spark.operators.dedup import dedup_documents
from etlpy_spark.operators.sampling import pack_sequences, stratified_sample


def _token_count_col(text_col: str, bpe_merges):
    """n_tokens source: the JVM regex proxy, or — when a merges table is
    given — the training tokenizer's true BPE count (functions/bpe.py,
    Arrow-batched)."""
    if bpe_merges is None:
        return tx.token_count(text_col)
    from etlpy_spark.functions.bpe import bpe_token_count

    return bpe_token_count(text_col, bpe_merges)


def annotate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    bpe_merges: list | None = None,
) -> DataFrame:
    """Attach the filterable signals: lang_pred, quality, n_tokens, and
    the four repetition fractions. One projection pass plus the
    repetition aggregates' join (all map-side combinable). With
    ``bpe_merges``, n_tokens is the true training-tokenizer BPE count."""
    feats = df.withColumn("lang_pred", tx.lang_id(text_col)) \
        .withColumn("quality", tx.quality_score(text_col)) \
        .withColumn("n_tokens", _token_count_col(text_col, bpe_merges))
    rep = tx.repetition_metrics(
        df, text_col=text_col, id_col=id_col, top_n=top_n, dup_n=dup_n
    ).drop("n_lines")
    return feats.join(rep, id_col)


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.6,
    max_dup_line_frac: float = 0.30,
    max_top_ngram_char_frac: float = 0.20,
    max_dup_ngram_char_frac: float = 0.30,
    redact_pii: bool = True,
    dedup_strategy: str | None = "minhash",
    dedup_threshold: float | None = None,
    sample_fractions: dict | None = None,
    strata_col: str = "lang_pred",
    seed: int = 0,
    pack_budget: int | None = None,
    checkpoint_dir: str | None = None,
    bpe_merges: list | None = None,
    c4_rules: bool = False,
) -> DataFrame:
    """df(text) -> training-ready corpus, one call.

    Returns the surviving rows with the annotation columns, the text
    PII-redacted in place (when ``redact_pii``), and — when
    ``pack_budget`` is set — ``bin_id``/``bin_fill`` context-window
    packing columns. Filter ceilings default to the common public
    settings (Gopher-rule ballpark); pass ``None``-ish extremes (e.g.
    ``min_quality=0.0``, ``max_*=1.0``) to disable a stage, or
    ``dedup_strategy=None`` / ``sample_fractions=None`` /
    ``pack_budget=None`` to skip those stages entirely. ``c4_rules=True``
    prepends the published C4 line/page cleaning (text.c4_clean): pages
    failing the C4 gate drop first, surviving lines become the text all
    later stages see.

    Determinism: every stage is a pure function of (row, seed) — no
    ``rand()``, no partition-order dependence — so the same input
    produces the same corpus on any cluster size or retry schedule.
    """
    if c4_rules:
        # C4 line/page cleaning FIRST (it rewrites the text): surviving
        # lines become the text every later stage sees, and pages failing
        # the C4 gate drop before any annotation work is spent on them
        df = (
            tx.c4_clean(df, col=text_col)
            .filter("c4_keep")
            .withColumn(text_col, F.col("c4_text"))
            .drop("c4_text", "c4_lines_kept", "c4_keep")
        )
    out = annotate_corpus(df, text_col=text_col, id_col=id_col,
                          bpe_merges=bpe_merges)
    out = out.filter(
        (F.col("quality") >= F.lit(min_quality))
        & (F.col("dup_line_frac") <= F.lit(max_dup_line_frac))
        & (F.col("top_ngram_char_frac") <= F.lit(max_top_ngram_char_frac))
        & (F.col("dup_ngram_char_frac") <= F.lit(max_dup_ngram_char_frac))
    )
    if redact_pii:
        # re-count tokens over the REDACTED text: downstream packing bins
        # on n_tokens, and '[EMAIL]' tokenizes differently than the PII it
        # replaced -- stale counts would mis-fill context-window bins
        out = out.withColumn(text_col, tx.redact_pii(text_col)) \
            .withColumn("n_tokens", _token_count_col(text_col, bpe_merges))
    if dedup_strategy is not None:
        out = dedup_documents(
            out,
            strategy=dedup_strategy,
            text_col=text_col,
            id_col=id_col,
            threshold=dedup_threshold,
            checkpoint_dir=checkpoint_dir,
        )
    if sample_fractions is not None:
        out = stratified_sample(
            out, strata_col=strata_col, fractions=sample_fractions,
            id_col=id_col, seed=seed,
        )
    if pack_budget is not None:
        out = pack_sequences(
            out, token_col="n_tokens", id_col=id_col, budget=pack_budget
        )
    return out
