"""End-to-end one-call corpus preparation (operators/corpus.py):
annotate -> filter -> redact -> dedup -> sample -> pack, with every stage
decision verifiable from the crafted inputs."""

import pytest
from pyspark.sql import functions as F

from etlpy_spark.operators.corpus import annotate_corpus, prepare_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "wanders off to find a quiet place in the sun where it can sleep "
    "for the rest of the afternoon without being disturbed by anyone"
)
NEAR_DUP = GOOD + " indeed"
PII = (
    "the contact for the quick brown fox project is fox@example.com and "
    "the office line is 555-123-4567 which the team answers during the "
    "day while the dog sleeps in the sun for the rest of the afternoon"
)
SPAM = "buy now " * 40  # one repeated 2-gram dominates
LOWQ = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"  # no alpha, no stopwords


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, NEAR_DUP),
        (3, PII),
        (4, SPAM),
        (5, LOWQ),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_annotate_adds_all_signals(corpus):
    out = annotate_corpus(corpus)
    cols = set(out.columns)
    assert {
        "lang_pred", "quality", "n_tokens", "dup_line_frac",
        "dup_line_char_frac", "top_ngram_char_frac", "dup_ngram_char_frac",
    } <= cols
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].lang_pred == "en"
    assert rows[4].top_ngram_char_frac > 0.5  # "buy now" spam
    assert rows[5].quality < rows[1].quality


def test_prepare_corpus_full_pipeline(corpus):
    out = prepare_corpus(
        corpus,
        min_quality=0.6,
        dedup_strategy="ngram",
        dedup_threshold=0.8,
        pack_budget=200,
    ).collect()
    kept = {r.doc_id: r for r in out}
    # spam filtered by repetition, low-quality by the quality floor
    assert 4 not in kept and 5 not in kept
    # near-dup pair collapsed to its keep-first survivor
    assert 1 in kept and 2 not in kept
    # PII doc survives with the text redacted in place
    assert 3 in kept
    assert "[EMAIL]" in kept[3].text and "[PHONE]" in kept[3].text
    assert "fox@example.com" not in kept[3].text
    # packing columns present and fills respect the budget
    for r in kept.values():
        assert r.bin_fill <= 200 and r.bin_id >= 0


def test_prepare_corpus_stage_toggles(corpus):
    # everything off -> all rows survive, text untouched, no bin columns
    out = prepare_corpus(
        corpus,
        min_quality=0.0,
        max_dup_line_frac=1.0,
        max_top_ngram_char_frac=1.0,
        max_dup_ngram_char_frac=1.0,
        redact_pii=False,
        dedup_strategy=None,
    )
    assert out.count() == 5
    assert "bin_id" not in out.columns
    assert out.filter(F.col("text").contains("fox@example.com")).count() == 1


def test_prepare_corpus_sampling_is_deterministic(spark):
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox document number "), F.col("id"),
            F.lit(" is a perfectly normal piece of text with enough words "
                  "in it to pass the quality floor and the stopword check "
                  "for the english language as expected"),
        ).alias("text"),
    )
    kw = dict(
        min_quality=0.0, max_dup_line_frac=1.0, max_top_ngram_char_frac=1.0,
        max_dup_ngram_char_frac=1.0, redact_pii=False, dedup_strategy=None,
        sample_fractions={"en": 0.25}, seed=7,
    )
    a = sorted(r.doc_id for r in prepare_corpus(docs, **kw).collect())
    b = sorted(
        r.doc_id
        for r in prepare_corpus(docs.repartition(13), **kw).collect()
    )
    assert a == b and 0 < len(a) < 400
    frac = len(a) / 400
    assert 0.15 < frac < 0.35  # hash gate tracks the requested 0.25


def test_pack_bins_on_redacted_token_counts(corpus):
    """n_tokens must be re-counted AFTER PII redaction: packing bins on
    the emitted (redacted) text, and '[EMAIL]' tokenizes differently than
    'fox@example.com' — regression: bins were filled with stale counts."""
    from etlpy_spark.operators.text import token_count

    out = prepare_corpus(
        corpus, dedup_strategy=None, sample_fractions=None, pack_budget=64
    )
    rows = out.withColumn("recount", token_count("text")).collect()
    assert rows, "pipeline dropped every row"
    pii_rows = [r for r in rows if "[EMAIL]" in r.text or "[PHONE]" in r.text]
    assert pii_rows, "expected the PII doc to survive the quality filter"
    for r in rows:
        assert r.n_tokens == r.recount, (
            f"doc {r.doc_id}: packed n_tokens {r.n_tokens} != "
            f"token_count of emitted text {r.recount}"
        )


def test_prepare_corpus_c4_rules(spark):
    from etlpy_spark.operators.text import c4_clean_py

    good = "\n".join(
        f"This is a perfectly fine training sentence number {i}." for i in range(5)
    )
    rows = [
        (1, good),
        (2, good + "\nPlease enable javascript to see this content."),
        (3, "short line\n" * 10),                  # no line survives -> page drops
        (4, good + "\nlorem ipsum dolor sit amet."),  # page gate drops it
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(
        df, min_quality=0.0, max_dup_line_frac=1.0,
        max_top_ngram_char_frac=1.0, max_dup_ngram_char_frac=1.0,
        redact_pii=False, dedup_strategy=None, c4_rules=True,
    ).collect()
    kept = {r.doc_id: r for r in out}
    assert set(kept) == {1, 2}
    assert kept[1].text == good                       # survives untouched
    assert kept[2].text == c4_clean_py(rows[1][1])[0]
    assert "javascript" not in kept[2].text.lower()   # the offending line is gone
    assert "c4_keep" not in kept[1].asDict()          # working columns dropped
