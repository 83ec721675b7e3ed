"""Driver harness part 2: large-scale training-data operators
(dedup / similarity / text analysis / multimodal) over the documents,
embeddings and synthetic-image tables, each with a DuckDB oracle where the
semantics are SQL-expressible (genuinely non-SQL ops are rows-only / WEAK
and covered by pytest instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlpy_spark.operators import dedup as dd
from etlpy_spark.operators import multimodal as mm
from etlpy_spark.operators import similarity as sim
from etlpy_spark.operators import text as tx

OFFSET = 100_000


def _t(spark, sf_dir, name) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_with_exact_copies(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    return d.unionByName(copies)


def _docs_with_near_copies(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return d.unionByName(copies)


# ---------------------------------------------------------------------------
# queries


def q_exact_dedup(spark, sf_dir):
    return dd.exact_dedup(_docs_with_exact_copies(spark, sf_dir)).select("doc_id")


def q_minhash_lsh_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(
        _docs_with_near_copies(spark, sf_dir), k=64, bands=32, n=3, threshold=0.6
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _docs_with_near_copies(spark, sf_dir), n=3, threshold=0.6
    )


def q_simhash(spark, sf_dir):
    return dd.simhash_bits(_t(spark, sf_dir, "documents"))


def q_embedding_near_dup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.select((F.col("vec_id") + OFFSET).alias("vec_id"), "embedding")
    both = e.unionByName(copies)
    return dd.embedding_near_dup_pairs(both, threshold=0.99).select("id_a", "id_b")


def q_ann_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.brute_force_topk(e, list(qv), k=10)


def q_ann_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.ivf_topk(e, list(qv), k=10).select("vec_id", "rank")


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.lang_id("text").alias("lang_pred"))


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


def q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.whitespace_token_count("text").alias("n_ws_tokens"),
    )


def q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


def q_image_decode_meta(spark, sf_dir):
    imgs = mm.synthetic_images_df(spark, n=200)
    return mm.decode_image_features(imgs).select("image_id", "w", "h", "fmt")


def q_image_resize(spark, sf_dir):
    imgs = mm.synthetic_images_df(spark, n=100)
    return mm.resize_images(imgs, size=16).select("image_id", "w", "h", "fmt")


def q_image_phash(spark, sf_dir):
    imgs = mm.synthetic_images_df(spark, n=100)
    return mm.decode_image_features(imgs).select("image_id", "phash", "mean_lum")


def q_video_frames_fake(spark, sf_dir):
    import pandas as pd

    def gen(batches):
        from etlpy_spark.functions.imagecodec import encode_raw, render_pixels

        for pdf in batches:
            vids, blobs = [], []
            for i in pdf["id"]:
                frames = [
                    encode_raw(render_pixels(f"img-{int(i) * 50 + j:012d}"))
                    for j in range(12)
                ]
                vids.append(f"vid-{int(i):04d}")
                blobs.append(b"".join(frames))
            yield pd.DataFrame({"video_id": vids, "bytes": blobs})

    vids = spark.range(0, 8, 1, 4).mapInPandas(gen, schema="video_id string, bytes binary")
    return mm.sample_video_frames(vids, every_n=5, _fake=True).select("video_id", "frame_idx")


# ---------------------------------------------------------------------------
# oracle SQL


def _shingle_cte(src: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM {src}),
        sh AS (
          SELECT doc_id, list_distinct(list({parts})) AS s
          FROM words, unnest(generate_series(1, len(w)-{n - 1})) t(i)
          GROUP BY doc_id
        )
    """


_NEAR_SRC = f"""
        src AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + {OFFSET}, text || ' zzz' FROM documents
        )
"""


def _jaccard_sql(n: int, threshold: float) -> str:
    return f"""
        WITH {_NEAR_SRC}, {_shingle_cte('src', n)}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
    """


def _simhash_sql(bits: int = 64) -> str:
    sums = ",\n".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    acc = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(bits - 1)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
        ), sums AS (
          SELECT id, {sums} FROM hashed GROUP BY id
        )
        SELECT id, ({acc}) AS simhash FROM sums
    """


_LANGS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "zu"],
}


def _lang_sql() -> str:
    score = {
        lang: (
            f"CAST(len(list_filter(ws, x -> list_contains({words!r}, lower(x)))) AS DOUBLE)"
            f" / greatest(len(ws), 1)"
        )
        for lang, words in _LANGS.items()
    }
    best = f"greatest({', '.join(score.values())})"
    case = " ".join(
        f"WHEN {score[lang]} = best THEN '{lang}'" for lang in _LANGS
    )
    return f"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
        ), s AS (SELECT doc_id, ws, {best} AS best FROM t)
        SELECT doc_id, CASE WHEN best = 0 THEN 'und' {case} ELSE 'und' END AS lang_pred
        FROM s
    """


def _quality_sql() -> str:
    en = _LANGS["en"]
    return f"""
        WITH t AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\\s+') AS ws,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
          FROM documents
        )
        SELECT doc_id, ROUND((
            CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1)
          + CASE WHEN len(ws) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.5 END
          + CASE WHEN CAST(len(list_filter(ws, x -> list_contains({en!r}, lower(x)))) AS DOUBLE)
                      / greatest(len(ws), 1) > 0.02 THEN 1.0 ELSE 0.6 END
        ) / 3.0, 4) AS quality
        FROM t
    """


def queries():
    return {
        "exact_dedup": q_exact_dedup,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash": q_simhash,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_ivf": q_ann_ivf,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "image_decode_meta": q_image_decode_meta,
        "image_resize": q_image_resize,
        "image_phash": q_image_phash,
        "video_frames_fake": q_video_frames_fake,
    }


def oracle_sql():
    return {
        "exact_dedup": "SELECT doc_id FROM documents",
        "minhash_lsh_pairs": _jaccard_sql(3, 0.6),
        "ngram_jaccard_pairs": _jaccard_sql(3, 0.6),
        "simhash": _simhash_sql(),
        "embedding_near_dup": f"""
            WITH e AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL SELECT vec_id + {OFFSET}, embedding FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
        """,
        "ann_bruteforce": """
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                       ) DESC, vec_id) AS rank
              FROM embeddings) WHERE rank <= 10
        """,
        # ann_ivf: approximate by design → rows-only; recall gate in pytest
        "lang_id": _lang_sql(),
        "quality_score": _quality_sql(),
        "token_count": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')) AS n_tokens,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens
            FROM documents
        """,
        "fingerprint": """
            WITH t AS (
              SELECT doc_id,
                     list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                    w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
              FROM documents
            )
            SELECT doc_id,
                   list_reduce(list_prepend(0::BIGINT, hs),
                               (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
            FROM t
        """,
        # replicates functions/imagecodec.image_spec: md5('{seed}|spec|{id}')
        # first-8-bytes big-endian; sizes by h%3, (h>>8)%3; fmt by (h>>16)%3
        "image_decode_meta": """
            WITH s AS (
              SELECT printf('img-%012d', i) AS image_id,
                     ('0x' || substr(md5('42|spec|img-' || printf('%012d', i)), 1, 16))::UBIGINT AS hv
              FROM generate_series(0, 199) t(i))
            SELECT image_id,
                   CASE hv % 3 WHEN 0 THEN 32 WHEN 1 THEN 64 ELSE 128 END AS w,
                   CASE (hv // 256) % 3 WHEN 0 THEN 32 WHEN 1 THEN 64 ELSE 128 END AS h,
                   CASE (hv // 65536) % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'ppm' ELSE 'png' END AS fmt
            FROM s
        """,
        "image_resize": """
            SELECT printf('img-%012d', i) AS image_id, 16 AS w, 16 AS h, 'ppm' AS fmt
            FROM generate_series(0, 99) t(i)
        """,
        # image_phash / video_frames_fake: procedural-content ops → rows-only
    }
