"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, exact n-gram-Jaccard (inverted-index join), embedding-cosine.

Scale shapes (the part that must survive 100 TB):
  - exact dedup: one shuffle on the content hash; keep-first via min_by.
  - MinHash LSH: signatures are one explode + a 64-column min() hash
    aggregate (codegen, map-side combine, no UDF); banding emits b narrow
    rows/doc; candidate generation is a groupBy on (band, bucket) with
    in-array pair expansion — one scan, never the O(n²) cross join;
    verification computes exact Jaccard only on candidates.
  - SimHash: explode tokens → one groupBy(doc) with 64 conditional sums —
    a single map-side-combinable aggregation.
  - n-gram Jaccard: inverted-index join on shingle (shuffle keyed by
    shingle) + count-sharing per pair; exact, and the standard way to do
    exact-Jaccard at scale.
  - embedding cosine: random-hyperplane LSH banding (numpy matmul per
    Arrow batch) + exact cosine verify; IVF routing in
    operators/similarity.py is the top-k path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _expand_pairs(grouped: DataFrame, arr_col: str) -> DataFrame:
    """Per-row unordered pair expansion of an array column (all i<j element
    pairs) via two chained explodes: posexplode anchors element i, a second
    explode walks the tail slice. Emits columns ``__x__``/``__y__``.
    Semantically identical to a nested transform/slice/flatten lambda form,
    but with a tiny expression tree — the lambda form's generated code cost
    ~25 s of driver-side Janino compile PER QUERY INVOCATION at 64-element
    bucket arrays (the single largest first-run cost in the LSH ops)."""
    a = grouped.select(
        F.col(arr_col).alias("__arr__"),
        F.posexplode(arr_col).alias("__i__", "__x__"),
    )
    return a.select(
        "__x__",
        F.explode(
            F.slice(F.col("__arr__"), F.col("__i__") + F.lit(2), F.size("__arr__"))
        ).alias("__y__"),
    )


def _capped_bucket_pairs(
    banded: DataFrame,
    group_cols: tuple[str, ...],
    elem_col: str,
    key_of,
    max_bucket: int | None,
) -> DataFrame:
    """Per-bucket unordered candidate pairs (``__x__``/``__y__``) with the
    mega-bucket failure mode bounded (shared by every banded LSH miner).

    ``max_bucket=None``: plain collect_list + all-pairs expansion — exact
    candidates, but array state and pair count are unbounded in bucket
    size (a boilerplate flood puts millions of members in ONE bucket:
    the aggregating task OOMs, then the expansion is O(b²)).

    With a cap: bucket sizes are counted FIRST (count + min_by — plain
    map-side-combinable aggregates, never an array). Buckets within the
    cap expand all-pairs exactly as before; larger buckets emit STAR
    candidates to the bucket's minimum-key member — O(b) rows, bounded
    task memory, connectivity-preserving through the hub once the caller
    verifies candidates exactly. One explicit repartition on the bucket
    key feeds both the size agg and the join-back, so the (expensive)
    banding stage is computed and shuffled once (ReusedExchange).

    ``key_of``: Column→Column total-orderable identity of an element
    (identity for plain id columns; ``e.id`` for struct payloads).
    """
    e = F.col(elem_col)
    if max_bucket is None:
        posts = (
            banded.groupBy(*group_cols)
            .agg(F.collect_list(e).alias("__es__"))
            .filter(F.size("__es__") > 1)
        )
        return _expand_pairs(posts, "__es__")
    banded = banded.repartition(*group_cols)
    sizes = banded.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min_by(e, key_of(e)).alias("__hub__"),
    )
    tagged = banded.join(sizes.filter(F.col("__n__") > 1), on=list(group_cols))
    small = (
        tagged.filter(F.col("__n__") <= max_bucket)
        .groupBy(*group_cols)
        .agg(F.collect_list(e).alias("__es__"))
    )
    small_pairs = _expand_pairs(small, "__es__")
    big_pairs = tagged.filter(
        (F.col("__n__") > max_bucket) & (key_of(e) != key_of(F.col("__hub__")))
    ).select(F.col("__hub__").alias("__x__"), e.alias("__y__"))
    return small_pairs.unionByName(big_pairs)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the upstream scan
    is narrower (a small parquet file = 1-2 partitions under the default
    128 MB split, which serializes every downstream per-row computation).
    At real scale the scan already has >= cores partitions and this is a
    no-op — no shuffle is added."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
    prefix_filter: bool = True,
    broadcast_verify_limit: int = 2_000_000,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via an inverted-index join — no cross
    join anywhere; the shuffle key is the shingle, so cost tracks shared
    content, not n². Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``prefix_filter=True`` (default) applies the AllPairs/PPJoin prefix
    principle (Bayardo et al. WWW'07; Xiao et al. WWW'08): under ANY
    global token order, two sets with J ≥ t must share a token among each
    side's first ``|X| - ceil(t·|X|) + 1`` tokens — so only that prefix
    of each doc's (sorted) shingle-hash set is indexed, and candidates
    verify exactly afterwards via one array_intersect join-back. Lossless:
    the output is identical to the exhaustive posting expansion, but the
    posting stream shrinks to the prefix fraction (~(1-t) of shingles)
    and pair expansion runs on prefix postings only — the difference
    between indexing 100 TB of shingles and indexing a 40 TB prefix
    slice. ``prefix_filter=False`` keeps the legacy full-posting counting
    path (shared counts straight from the postings, no join-back).

    Scale note: this is the EXACT miner, so its output (and therefore its
    cost) is provably Ω(true pair count) — a boilerplate flood of d
    near-identical docs genuinely HAS d² qualifying pairs, and capping
    posting lists would silently undercount shared shingles (wrong
    jaccard), unlike the LSH miners' verified star fallback. For
    dup-heavy corpora at scale, mine with ``minhash_lsh_pairs``
    (mega-bucket-capped) and reserve this operator for corpora where the
    qualifying pair count is known to be tractable."""
    # filter on the cheap word count, NOT on size(shingles): a predicate
    # containing the higher-order shingle expression gets pushed below the
    # projection and re-evaluated interpreted per row (measured 7x the
    # whole shingle computation). words >= n  ⟺  at least one shingle.
    sh = (
        _spread(df)
        .filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n)
        .select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    )
    if prefix_filter:
        return _ngram_jaccard_prefix(sh, threshold, broadcast_verify_limit)
    # shuffle 8-byte shingle hashes, not the shingle strings (exactness is
    # preserved up to xxhash64 collisions, ~2^-32 at these cardinalities;
    # the jaccard itself is computed from true counts)
    inv = sh.select(
        "id", F.size("sh").alias("n_sh"), F.explode(shingle_hashes(F.col("sh"))).alias("shingle_h")
    )
    # posting-list groupBy instead of an inverted-index SELF-join: the join
    # evaluates the scan+shingle+explode plan once per side; the groupBy
    # reads it once, shuffles (shingle_h, id, n_sh), and expands the same
    # pair multiset in-array. |sh| is carried so size-incompatible pairs
    # (J >= t needs t <= n_a/n_b <= 1/t) are pruned BEFORE the pair
    # aggregation.
    posts = (
        inv.groupBy("shingle_h")
        .agg(F.collect_list(F.struct("id", "n_sh")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    x, y = F.col("__x__"), F.col("__y__")
    a = F.when(x["id"] < y["id"], x).otherwise(y)
    b = F.when(x["id"] < y["id"], y).otherwise(x)
    pairs = (
        _expand_pairs(posts, "ps")
        .select(
            a["id"].alias("id_a"),
            a["n_sh"].alias("n_a"),
            b["id"].alias("id_b"),
            b["n_sh"].alias("n_b"),
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * threshold <= F.col("n_b"))
            & (F.col("n_b") * threshold <= F.col("n_a"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
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


def _ngram_jaccard_prefix(
    sh: DataFrame, threshold: float, broadcast_verify_limit: int
) -> DataFrame:
    """Prefix-filtered exact Jaccard (see ngram_jaccard_pairs). ``sh`` is
    (id, sh: array<string> distinct shingles). The sorted shingle-HASH
    array is the global total order (uniform, data-independent); the
    epsilon keeps float ceil(t·n) from landing one above the exact
    rational ceil (a too-short prefix would lose pairs; one element
    longer merely prunes less)."""
    docs = sh.select(
        "id",
        F.sort_array(F.array_distinct(shingle_hashes(F.col("sh")))).alias("hs"),
    ).withColumn("n_sh", F.size("hs"))
    plen = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)) + 1
    # pos (0-based index in the sorted set) rides along for the POSITIONAL
    # filter below: a token at position p leaves only n_sh-1-p tokens after
    # it in this doc's sorted order
    inv = docs.select(
        "id", "n_sh", F.posexplode(F.slice("hs", 1, plen)).alias("pos", "shingle_h")
    )
    posts = (
        inv.groupBy("shingle_h")
        .agg(F.collect_list(F.struct("id", "n_sh", "pos")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    x, y = F.col("__x__"), F.col("__y__")
    a = F.when(x["id"] < y["id"], x).otherwise(y)
    b = F.when(x["id"] < y["id"], y).otherwise(x)
    # positional filter (PPJoin): matching at sorted positions (pa, pb)
    # bounds the overlap by 1 + min(tokens after pa, tokens after pb); the
    # FIRST common token gives the largest bound, so a pair is dropped
    # only when even its best collision cannot reach
    # minoverlap = ceil(t/(1+t)·(n_a+n_b)) ⟺ J ≥ t — still lossless.
    pair_ids = (
        _expand_pairs(posts, "ps")
        .filter(x["id"] != y["id"])
        .select(a["id"].alias("id_a"), b["id"].alias("id_b"),
                a["n_sh"].alias("n_a"), b["n_sh"].alias("n_b"),
                a["pos"].alias("pos_a"), b["pos"].alias("pos_b"))
        # size-ratio prune (J >= t needs t <= n_a/n_b <= 1/t), then the
        # positional bound, then dedup candidates BEFORE the join-back
        .filter(
            (F.col("n_a") * threshold <= F.col("n_b"))
            & (F.col("n_b") * threshold <= F.col("n_a"))
        )
        .filter(
            1
            + F.least(
                F.col("n_a") - 1 - F.col("pos_a"),
                F.col("n_b") - 1 - F.col("pos_b"),
            )
            >= F.ceil(
                F.lit(threshold / (1.0 + threshold))
                * (F.col("n_a") + F.col("n_b"))
                - F.lit(1e-9)
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification — same candidate-join shape (and broadcast gate)
    # as minhash_lsh_pairs' verify stage
    pair_ids = pair_ids.persist()
    n_cand = pair_ids.count()
    cand_side = (
        F.broadcast(pair_ids) if n_cand <= broadcast_verify_limit else pair_ids
    )
    cand = cand_side.join(
        docs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
    ).join(docs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def shingle_hashes(sh: Column) -> Column:
    """Hash each shingle string ONCE (xxhash64); the k permutations then
    re-hash these fixed-width longs (k string-hash passes over every
    shingle would dominate signature construction)."""
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
    broadcast_verify_limit: int = 2_000_000,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Candidate pairs via LSH banding (b bands × r=k/b rows; a pair lands
    in a bucket iff a whole band of minhashes agrees), then EXACT Jaccard
    verification of candidates only. With r=2, b=32 the detect probability
    at j=0.6 is 1-(1-0.36)^32 ≈ 1-6e-7 — misses are negligible and false
    candidates are removed by verification, so the output matches the exact
    operator with near-certainty while touching ~candidate pairs only.

    ``max_bucket`` bounds the mega-bucket failure mode: boilerplate-heavy
    corpora put millions of near-identical docs into ONE band bucket, where
    unbounded ``collect_list`` OOMs the aggregating task before the O(b²)
    pair expansion even starts. Buckets at or under the cap expand
    all-pairs (exact candidates, the normal case — at the default 4096 the
    largest in-array state is ~32 KB/bucket). Buckets over the cap emit
    STAR candidates instead — every member paired with the bucket's min
    id — O(b) rows, still exact-Jaccard-verified like any candidate, so
    over-cap output is connectivity-preserving through the hub (exact
    duplicates collide in every band and verify at j=1.0, so
    ``dedup_by_pairs`` clustering is unaffected) rather than
    pair-exhaustive. An over-cap bucket means ≥ max_bucket² candidate
    pairs from ONE band collision — at that density exhaustive pair output
    is the wrong contract at any scale. Set ``max_bucket=None`` to force
    pair-exhaustive expansion regardless of bucket size."""
    r = k // bands

    def hashed(src: DataFrame) -> DataFrame:
        """(id, hs: array<long>) — 8-byte hashed shingles. Narrow enough to
        shuffle/recompute; the string arrays never leave their scan stage.
        The non-empty filter tests the cheap word count, not size(hs) — a
        size(hs) predicate pushes the shingle HOF below the projection and
        re-evaluates it interpreted per row (measured 7x slower)."""
        return (
            _spread(src)
            .filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n)
            .select(
                F.col(id_col).alias("id"),
                shingle_hashes(word_shingles(text_col, n)).alias("hs"),
            )
        )

    # signatures + band buckets in ONE shuffle-free Arrow pass: a doc's
    # signature depends only on its own shingles, so it's embarrassingly
    # parallel — mapInPandas with numpy `minimum.reduceat` over the
    # flattened per-batch shingle hashes computes all k permutation mins
    # per doc without the explode shuffle + k-column hash-aggregate the r1
    # version paid (whose 64-min generated code also cost seconds of
    # driver-side Janino compile per invocation). Permutations are k
    # independent 64-bit affine maps g_s(x) = a_s*x + b_s, a_s odd, uint64
    # wraparound (numpy wraps where ANSI SQL would raise) — the standard
    # universal family, so per-band collision independence matches the
    # seeded-rehash version; candidate recall only, verification below is
    # exact either way.
    def sig_bands(batches):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(0x5EED)
        A = (rng.randint(0, 1 << 62, size=k).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        B = rng.randint(0, 1 << 62, size=k).astype(np.uint64)
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            arrs = pdf["hs"].to_numpy()
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=m)
            flat = np.concatenate(arrs).astype(np.uint64)
            starts = np.zeros(m, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sig = np.empty((m, k), dtype=np.uint64)
            for s in range(k):
                sig[:, s] = np.minimum.reduceat(A[s] * flat + B[s], starts)
            # per-band bucket: mix the r mins with odd constants + the band
            # index, then an avalanche shift — deterministic, band-disjoint
            codes = sig.reshape(m, bands, r)
            mixed = (codes[:, :, 0] * C1 + np.arange(bands, dtype=np.uint64)) ^ (
                codes[:, :, 1] * C2 if r > 1 else 0
            )
            for j in range(2, r):
                mixed = (mixed ^ (codes[:, :, j] * C1)) * C2
            mixed ^= mixed >> np.uint64(29)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), m),
                    "bucket": mixed.astype(np.int64).reshape(-1),
                }
            )

    banded = hashed(df).mapInPandas(sig_bands, schema="id long, band int, bucket long")
    # candidate pairs via groupBy(bucket) + in-array pair expansion, NOT a
    # self-join: a self-join evaluates the (expensive) signature plan once
    # per side; the groupBy reads it once and shuffles only (id, band,
    # bucket). Per-bucket expansion is quadratic in bucket size — exactly
    # the same pair count the self-join would shuffle, without the second
    # signature pass.
    raw_pairs = _capped_bucket_pairs(
        banded, ("band", "bucket"), "id", lambda c: c, max_bucket
    ).select(
        F.least("__x__", "__y__").alias("id_a"),
        F.greatest("__x__", "__y__").alias("id_b"),
    )
    # distinct BEFORE the shingle join-back: a pair colliding in m bands
    # would otherwise verify (and emit) m times
    pair_ids = raw_pairs.distinct()
    # exact verification on the hashed shingle sets (exact up to xxhash64
    # collisions, ~2^-64·|sh| per pair — the same contract as
    # ngram_jaccard_pairs; jaccard counts come from true set sizes).
    # Candidates are USUALLY a vanishing fraction of docs — broadcasting
    # them makes the two shingle-set lookups broadcast joins that STREAM
    # the doc scan (no shuffle/sort of the full shingle table per side).
    # But candidate volume is data-dependent: a dup-heavy corpus can emit
    # candidate sets past driver/broadcast limits, so the hint is gated on
    # an exact count (pair_ids is persisted, so the count costs nothing
    # extra — the verify join reads the same cache instead of re-running
    # the banding plan); above the limit AQE picks the join strategy.
    # Cache lifetime: the blocks live until the returned plan is GC'd on
    # the driver (Spark's ContextCleaner unpersists then); a session
    # looping over many corpora should drop references between runs or
    # call spark.catalog.clearCache().
    pair_ids = pair_ids.persist()
    n_cand = pair_ids.count()
    cand_side = (
        F.broadcast(pair_ids) if n_cand <= broadcast_verify_limit else pair_ids
    )
    hs = hashed(df)
    cand = cand_side.join(
        hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
    ).join(hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


_LONG_MAX = (1 << 63) - 1


def _signature_from_hashes(hs: Column, k: int) -> Column:
    """All k permutation-mins in ONE aggregate fold: acc[i] is the running
    min of xxhash64(shingle_hash, seed=i). The seeded permutation hashes
    the 8-byte long (not the shingle string) — overflow-free under ANSI
    mode and ~constant cost per (element, seed)."""
    seeds = F.array(*[F.lit(s) for s in range(k)])
    init = F.array_repeat(F.lit(_LONG_MAX).cast("long"), k)
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(acc, seeds, lambda a, s: F.least(a, F.xxhash64(h, s))),
    )


def minhash_signature_from_shingles(sh: Column, k: int = 64) -> Column:
    return _signature_from_hashes(shingle_hashes(sh), k)


# ---------------------------------------------------------------------------
# SimHash


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 bits: int = 64) -> DataFrame:
    """64-bit SimHash: per token a deterministic hash (md5-prefix, shared
    with SQL oracles); bit i of the result is the sign of the sum over all
    tokens of ±1 at bit i. One explode + one aggregation (map-side
    combinable)."""
    toks = _spread(df).select(
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


def _shingle_hash_rows(
    df: DataFrame, text_col: str, n: int, carry: list[str]
) -> DataFrame:
    """``carry`` columns + one exploded DISTINCT word-n-gram shingle hash
    per row (``__bh__``). The token array is materialized in its OWN
    projection and the xxhash64 sits INSIDE a single transform: the
    composed ``shingle_hashes(word_shingles(...))`` column nests one
    interpreted HOF inside another, which re-evaluates the inner
    split/shingle work per outer element — measured 27x slower on
    900-word docs (the r2 "interpreted HOF defeats CSE" pitfall, hit
    again at decontamination's n=8 doc lengths)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(*carry, toks.alias("__ws__")).filter(
        F.size("__ws__") >= n
    )
    k = F.size(F.col("__ws__")) - F.lit(n - 1)
    sh = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.xxhash64(
            F.concat_ws(
                " ", *[F.element_at(F.col("__ws__"), i + j) for j in range(n)]
            )
        ),
    )
    return base.select(*carry, F.explode(F.array_distinct(sh)).alias("__bh__"))


def mark_contaminated(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str = "text",
    broadcast_limit: int = 5_000_000,
) -> DataFrame:
    """Benchmark decontamination marking: annotate every training doc with
    the number of benchmark word n-grams it contains (``contaminated_ngrams``,
    0 = clean). The standard LLM-training hygiene step (GPT-3 used 13-gram,
    Llama 10-gram overlap removal); n=8 default.

    Shape at scale: the benchmark side collapses to DISTINCT 8-byte shingle
    hashes — benchmarks are small (10^4-10^6 items), so that set broadcasts
    (gated on an exact count, like the LSH verify stages) and the training
    corpus streams through one semi-join-shaped hash probe without
    shuffling the corpus. Above the gate the join falls back to AQE's
    choice, keyed by the 8-byte hash either way."""
    bench_sh = (
        _shingle_hash_rows(_spread(benchmark), bench_text_col, n, carry=[])
        .distinct()
        .persist()
    )
    n_bench = bench_sh.count()
    bench_side = F.broadcast(bench_sh) if n_bench <= broadcast_limit else bench_sh
    doc_sh = _shingle_hash_rows(
        df.select(F.col(id_col).alias("__did__"), F.col(text_col)),
        text_col, n, carry=["__did__"],
    )
    hits = (
        doc_sh.join(bench_side, on="__bh__", how="inner")
        .groupBy("__did__")
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    return df.join(
        hits.select(F.col("__did__").alias(id_col), "contaminated_ngrams"),
        on=id_col, how="left",
    ).withColumn(
        "contaminated_ngrams", F.coalesce("contaminated_ngrams", F.lit(0))
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop every training doc sharing at least one benchmark word n-gram
    (see mark_contaminated); returns df's original columns."""
    marked = mark_contaminated(
        df, benchmark, text_col=text_col, id_col=id_col, n=n,
        bench_text_col=bench_text_col,
    )
    return marked.filter(F.col("contaminated_ngrams") == 0).drop(
        "contaminated_ngrams"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit SimHash signatures + banded-Hamming
    candidate mining — the SAME pigeonhole-exact machinery as the image
    pHash miner (multimodal.phash_near_dup_pairs): split the signature
    into max_hamming+1 bands, a pair within the radius must match at
    least one band exactly, candidates verify with bit_count(xor).
    Returns (id_a, id_b, hamming) with id_a < id_b — exact for the radius
    GIVEN the signatures (SimHash locality itself is approximate: Hamming
    distance tracks, but does not equal, content similarity — that
    tradeoff is the operator's contract, unlike the Jaccard miners)."""
    from etlpy_spark.operators.multimodal import phash_near_dup_pairs

    sigs = simhash_bits(df, text_col=text_col, id_col=id_col)
    return phash_near_dup_pairs(
        sigs, phash_col="simhash", id_col="id",
        max_hamming=max_hamming, max_bucket=max_bucket,
    )


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
    planes_per_band: int = 8,
    bands: int = 16,
    seed: int = 7,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH banding + exact
    cosine verification.

    Each band hashes the sign pattern of r hyperplane projections
    (sign-match probability per plane = 1 - θ/π); a candidate pair must
    agree on a whole band. At cos ≥ 0.95 the per-band hit rate is ~0.43,
    so 16 bands miss with prob (1-0.43)^16 ≈ 1e-4 — and identical vectors
    collide in EVERY band. This replaces the r1 prefix-sum sign blocking,
    which deterministically missed near-dups straddling a sign boundary.

    Projections are one Arrow-batched numpy matmul per batch (V @ H.T —
    the vectorized-UDF case: 128 per-element fold expressions would run
    interpreted); candidates then verify with the exact JVM-side cosine.

    ``max_bucket`` bounds mega-buckets (embedding floods: zero vectors,
    deduplicated-content re-embeddings) the same way as
    ``minhash_lsh_pairs``: over-cap buckets emit exact-verified star
    candidates to the bucket's min id instead of all-pairs — bounded task
    memory and O(b) rows, connectivity-preserving; ``None`` restores
    unconditional all-pairs expansion.
    """
    import numpy as np

    probe = df.select(vec_col).head()
    if probe is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cos double")
    dim = len(probe[0])
    rng = np.random.RandomState(seed)
    H = rng.normal(size=(bands * planes_per_band, dim))

    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    r = planes_per_band
    weights = (1 << np.arange(r)).astype(np.int64)

    @pandas_udf("array<long>")
    def band_buckets(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (V @ H.T) > 0  # (n, bands*r)
        codes = bits.reshape(len(V), bands, r) @ weights  # (n, bands)
        # encode band id into the bucket so different bands never collide
        buckets = codes + (np.arange(bands, dtype=np.int64) << r)
        return pd.Series(list(buckets))

    v = _spread(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    banded = v.select("id", F.explode(band_buckets(F.col("v"))).alias("bucket"))
    pair_ids = (
        _capped_bucket_pairs(banded, ("bucket",), "id", lambda c: c, max_bucket)
        .select(
            F.least("__x__", "__y__").alias("id_a"),
            F.greatest("__x__", "__y__").alias("id_b"),
        )
        .distinct()
    )
    cand = pair_ids.join(
        v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a"
    ).join(v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
    return (
        cand.withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> connected components -> canonical survivors


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 25, checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (id, cluster_id)
    with cluster_id = min member id. The step a real dedup pipeline runs
    AFTER pair mining: near-duplication is transitive in effect (A~B~C
    should keep ONE survivor even if A~C was never emitted).

    Algorithm: iterative min-label propagation. Each round every node
    takes min(own label, neighbors' labels) — two hash-join/agg stages
    per round, all shuffles keyed by node id, converging in O(graph
    diameter) rounds (near-dup clusters are shallow: diameter is tiny
    even at 10^10 docs, and rounds are independent Spark jobs, so this
    runs at any scale; the large-star/small-star variant trades more
    edges per round for O(log n) worst-case rounds — unnecessary here).
    Convergence is detected by a changed-label count hitting zero. Each
    round's labels are checkpointed — iterative self-joins MUST truncate
    lineage or the logical plan doubles per round and the driver OOMs
    planning it. ``checkpoint_dir=None`` (default) uses
    ``localCheckpoint()`` — executor-local blocks, right for a single-box
    run; at production scale pass a SHARED-STORAGE path and each round's
    labels go through reliable ``checkpoint()`` instead, so an executor
    loss mid-iteration recomputes from storage rather than restarting the
    whole algorithm.
    """

    def ckpt(d: DataFrame) -> DataFrame:
        return d.checkpoint() if checkpoint_dir else d.localCheckpoint()

    # setCheckpointDir is session-GLOBAL state: remember the application's
    # own dir and restore it on exit so a library call does not silently
    # redirect every later checkpoint() in the session. (If no dir was set
    # before, Spark offers no unset — ours stays, which is harmless: it is
    # only read by code that opted into reliable checkpoints.)
    sc = pairs.sparkSession.sparkContext
    prev_ckpt_dir = sc.getCheckpointDir() if checkpoint_dir else None
    if checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
    edges = ckpt(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = ckpt(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        # min neighbor label per node, joined against current labels
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        tentative = labels.join(nbr_min, on="id", how="left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
            F.col("label").alias("__old__"),
        )
        # pointer jump (path compression): label <- label(label). Plain
        # propagation moves the min ONE hop per round (O(diameter) rounds
        # — a 41-node chain needs 40); the jump doubles the reach so
        # convergence is O(log n) rounds even on path-shaped clusters.
        parent = tentative.select(
            F.col("id").alias("__pid__"), F.col("label").alias("__pl__")
        )
        new_labels = (
            tentative.join(
                parent, tentative["label"] == parent["__pid__"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("__pl__", F.col("label"))
                ).alias("label"),
                (
                    F.least(F.col("label"), F.coalesce("__pl__", F.col("label")))
                    < F.col("__old__")
                ).cast("long").alias("__chg__"),
            )
        )
        new_labels = ckpt(new_labels)
        changed = new_labels.agg(F.sum("__chg__")).first()[0] or 0
        labels = new_labels.drop("__chg__")
        if changed == 0:
            break
    if prev_ckpt_dir is not None and prev_ckpt_dir != checkpoint_dir:
        # every round's checkpoint already materialized inside the loop,
        # so restoring here cannot redirect our own writes
        sc.setCheckpointDir(prev_ckpt_dir)
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_by_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id_a: str = "id_a", id_b: str = "id_b", checkpoint_dir: str | None = None,
) -> DataFrame:
    """Keep one survivor per near-dup cluster (the min id — deterministic),
    passing through every row not in any pair. Composes with any pair
    miner above: minhash_lsh_pairs / ngram_jaccard_pairs /
    embedding_near_dup_pairs / phash banding. One broadcast-or-shuffle
    join against the (small: only clustered ids) component map."""
    comp = connected_components(
        pairs, id_a=id_a, id_b=id_b, checkpoint_dir=checkpoint_dir
    )
    survivors_in_clusters = comp.filter(F.col("id") == F.col("cluster_id"))
    clustered_ids = comp.select(F.col("id").alias(id_col))
    keep_clustered = df.join(
        survivors_in_clusters.select(F.col("id").alias(id_col)),
        on=id_col, how="left_semi",
    )
    untouched = df.join(clustered_ids, on=id_col, how="left_anti")
    return untouched.unionByName(keep_clustered)


def dedup_documents(
    df: DataFrame,
    strategy: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
    checkpoint_dir: str | None = None,
    **miner_kwargs,
) -> DataFrame:
    """One-call training-corpus dedup: mine near-dup pairs with the chosen
    strategy, cluster them (connected components), keep one survivor per
    cluster. The convenience composition of the primitives above — each
    stays available for pipelines that need the pairs or clusters.

    strategy: ``exact`` (hash identity, no pair mining), ``minhash``
    (LSH + exact-Jaccard verify — the corpus-scale default), ``ngram``
    (exhaustive exact Jaccard), or ``embedding`` (hyperplane LSH + exact
    cosine; pass ``vec_col``/thresholds through ``miner_kwargs``).
    ``threshold=None`` uses each miner's default. ``checkpoint_dir`` is
    forwarded to the clustering iteration (shared storage at production
    scale; executor-local otherwise)."""
    if strategy == "exact":
        return exact_dedup(df, text_col=text_col, id_col=id_col)
    if strategy == "minhash":
        miner = minhash_lsh_pairs
    elif strategy == "ngram":
        miner = ngram_jaccard_pairs
    elif strategy == "embedding":
        miner = embedding_near_dup_pairs
    else:
        raise ValueError(f"unknown dedup strategy {strategy!r}")
    if strategy == "embedding":
        kw = dict(id_col=id_col, **miner_kwargs)
    else:
        kw = dict(text_col=text_col, id_col=id_col, **miner_kwargs)
    if threshold is not None:
        kw["threshold"] = threshold
    pairs = miner(df, **kw)
    return dedup_by_pairs(df, pairs, id_col=id_col, checkpoint_dir=checkpoint_dir)
