"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, exact n-gram-Jaccard (inverted-index join), embedding-cosine.

Scale shapes (the part that must survive 100 TB):
  - exact dedup: one shuffle on the content hash; keep-first via min_by.
  - MinHash LSH: signatures are k JVM-side array_min/xxhash64 expressions
    (no UDF); banding explodes b rows/doc; candidate generation is a
    self-join on (band, band_hash) — i.e. a shuffle keyed by bucket, never
    the O(n²) cross join; verification computes exact Jaccard only on
    candidates.
  - SimHash: explode tokens → one groupBy(doc) with 64 conditional sums —
    a single map-side-combinable aggregation.
  - n-gram Jaccard: inverted-index join on shingle (shuffle keyed by
    shingle) + count-sharing per pair; exact, and the standard way to do
    exact-Jaccard at scale.
  - embedding cosine: bounded block self-join (here; IVF/LSH routing in
    operators/similarity.py is the scale path for top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content (hash-groupBy; the content
    hash keys the shuffle so giant texts don't travel twice)."""
    h = F.xxhash64(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return df.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") == 1).drop("__rk__")


# ---------------------------------------------------------------------------
# shingles + exact jaccard


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>); empty when < n words."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.split(F.trim(c), r"\s+")
    k = F.size(ws) - F.lit(n - 1)
    sh = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via an inverted-index join: explode
    shingles, self-join on shingle, count shared shingles per id pair,
    jaccard = shared / (|A| + |B| - shared). Returns (id_a, id_b, jaccard)
    with id_a < id_b. No cross join anywhere — the shuffle key is the
    shingle, so cost tracks shared content, not n²."""
    sh = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")).filter(
        F.size("sh") >= 1
    )
    # carry |sh| through the join so size-incompatible pairs (J >= t needs
    # t <= n_a/n_b <= 1/t) are pruned BEFORE the pair aggregation, and
    # shuffle 8-byte shingle hashes, not the shingle strings (exactness is
    # preserved up to xxhash64 collisions, ~2^-32 at these cardinalities;
    # the jaccard itself is computed from true counts)
    inv = sh.select(
        "id", F.size("sh").alias("n_sh"), F.explode(shingle_hashes(F.col("sh"))).alias("shingle_h")
    )
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), on="shingle_h")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.n_sh") * threshold <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * threshold <= F.col("a.n_sh"))
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    out = (
        pairs.withColumn(
            "jaccard", F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH


def _perm_min(hs: Column, seed: int) -> Column:
    # NB: the lambda must stay single-parameter (a two-parameter lambda in
    # F.transform means (element, index)) — seed is bound by closure.
    # xxhash64 over the 8-byte long (NOT the shingle string) is the seeded
    # permutation: overflow-free under ANSI mode, and ~constant cost.
    return F.array_min(F.transform(hs, lambda h: F.xxhash64(h, F.lit(seed))))


def shingle_hashes(sh: Column) -> Column:
    """Hash each shingle string ONCE (xxhash64); the k permutations then
    re-hash these fixed-width longs. Re-hashing the full strings per seed
    (k string-hash passes over every shingle) was the dominant cost of
    signature construction; Catalyst's subexpression elimination computes
    this array a single time for all k mins."""
    return F.transform(sh, lambda s: F.xxhash64(s))


def minhash_signature(col: Column | str, k: int = 64, n: int = 3) -> Column:
    """k-permutation MinHash over word n-gram shingles — one xxhash64 pass
    over the shingles + k seeded long-rehash permutations, all JVM-side."""
    sh = word_shingles(col, n)
    return minhash_signature_from_shingles(sh, k)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 32,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Candidate pairs via LSH banding (b bands × r=k/b rows; a pair lands
    in a bucket iff a whole band of minhashes agrees), then EXACT Jaccard
    verification of candidates only. With r=2, b=32 the detect probability
    at j=0.6 is 1-(1-0.36)^32 ≈ 1-6e-7 — misses are negligible and false
    candidates are removed by verification, so the output matches the exact
    operator with near-certainty while touching ~candidate pairs only."""
    r = k // bands
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n).alias("sh"),
    ).filter(F.size("sh") >= 1)
    sh = sh.cache()
    sig = sh.withColumn("sig", minhash_signature_from_shingles(F.col("sh"), k))
    # band rows carry ONLY (id, band, bucket) — exploding the shingle
    # arrays x bands through the bucket shuffle multiplies shuffle bytes
    # by the banding factor; shingles are joined back onto the distinct
    # candidate id-pairs instead
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r)), b
                ),
            )
        ).alias("band", "bucket"),
    )
    pair_ids = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    cand = pair_ids.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature_from_shingles(sh: Column, k: int = 64) -> Column:
    hs = shingle_hashes(sh)
    return F.array(*[_perm_min(hs, seed) for seed in range(k)])


# ---------------------------------------------------------------------------
# SimHash


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 bits: int = 64) -> DataFrame:
    """64-bit SimHash: per token a deterministic hash (md5-prefix, shared
    with SQL oracles); bit i of the result is the sign of the sum over all
    tokens of ±1 at bit i. One explode + one aggregation (map-side
    combinable)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.withColumn("h", h)
    sums = toks.groupBy("id").agg(
        *[
            F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    acc: Column = F.lit(0).cast("long")
    for i in range(bits - 1):  # top bit left 0 to stay in signed-64 range
        acc = acc + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i)).otherwise(0)
    return sums.select(F.col("id"), acc.alias("simhash"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup pairs. Blocking key = sign of the first principal-ish
    component (sum of elements): exact for threshold→1 cases like true
    duplicates and cheap; a real 100 TB run would use the IVF routing in
    operators/similarity.py. Self-join stays within blocks."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # block: coarse signature (sign pattern of 4 prefix-sums) — identical
    # vectors share it; near-identical vectors share it w.h.p.
    def block(col: Column) -> Column:
        quarters = [
            F.aggregate(F.slice(col, i * 16 + 1, 16), F.lit(0.0), lambda s, x: s + x)
            for i in range(4)
        ]
        sig: Column = F.lit(0)
        for i, q in enumerate(quarters):
            sig = sig + F.when(q > 0, F.lit(1 << i)).otherwise(0)
        return sig

    vb = v.withColumn("blk", block(F.col("v")))
    pairs = (
        vb.alias("a")
        .join(vb.alias("b"), on="blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
    return pairs
