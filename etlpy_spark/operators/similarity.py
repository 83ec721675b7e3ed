"""Similarity search over embedding columns: brute-force cosine top-k (the
exactness baseline) and an IVF-style bucketed ANN (the scale path).

Brute force is a single scan + one global top-k (sort of n rows is the
unavoidable cost of exact k-NN); at 100 TB the IVF variant routes the query
to a handful of coarse cells so the scan touches ~n/cells rows, and the PQ
variant (train_pq / pq_encode / query_pq) shrinks each row to m uint8
codes scanned via an ADC lookup table so the touched BYTES are O(n·m)
instead of O(n·dim·4). The two compose (partition the codes by IVF cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Global top-k of a (vec_id, cos) frame WITHOUT an unpartitioned
    Window: ``orderBy().limit(k)`` plans as TakeOrderedAndProject
    (per-partition heap + driver merge of k rows), then rank is stamped
    over only the k survivors — a window over k rows is O(k), not
    O(corpus). Tie-break on vec_id keeps the output deterministic."""
    topk = scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w))


def _cos_math(V, q):
    """Cosine of each row of a (n, dim) float64 batch vs q —
    batch-size-invariant (sum(axis=1) reductions only, no BLAS gemm; see
    _ivf_math) so serial replicas reproduce Arrow-batched runs exactly."""
    import numpy as np

    dot = (V * q).sum(axis=1)
    norms = np.sqrt((V * V).sum(axis=1)) * np.sqrt((q * q).sum())
    return dot / norms


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Two scoring
    paths, same results, measured crossover (interleaved A/B, local[32]):

    - expression path (default): one zip_with/aggregate fold per row.
      Higher-order lambdas evaluate INTERPRETED, but the whole plan stays
      JVM-side with no Python workers — fastest below ~10^5 rows
      (sf0.1's 6k embeddings: 0.42 s vs 0.70 s for the kernel, whose
      fixed Arrow round-trip dominates tiny inputs).
    - ``vectorized=True``: the shared Arrow-batched numpy kernel
      (_cos_math). One ~200-interpreted-evals/row fold vs one vectorized
      batch: the kernel wins once rows ≫ the worker round-trip — at a
      100 TB corpus scan this is the only sane path (the same tradeoff
      measured the other way on ivf_topk, whose 16-cell assignment is
      heavy enough that numpy already wins at 6k rows).

    Either way the global top-k never materializes a sort: each partition
    feeds k rows into TakeOrderedAndProject (plan pinned by
    tools/plan_audit.py)."""
    if vectorized:
        import numpy as np

        q = np.asarray(query_vec, dtype=np.float64)
        id_type = df.schema[id_col].dataType.simpleString()

        def score(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                yield pd.DataFrame(
                    {"vec_id": pdf["id"].to_numpy(), "cos": _cos_math(V, q)}
                )

        from etlpy_spark.operators.dedup import _spread

        scored = (
            _spread(df)
            .select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
            .mapInPandas(score, schema=f"vec_id {id_type}, cos double")
        )
    else:
        from etlpy_spark.operators.dedup import cosine

        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = df.select(
            F.col(id_col).alias("vec_id"),
            cosine(_vec(vec_col), qlit).alias("cos"),
        )
    return _rank_topk(scored, k).select("vec_id", "rank")


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantize by nearest of C centroids, search the
# query's nprobe nearest cells only.


def _kmeans_lite(vectors, n_cells: int, iters: int = 5):
    """Tiny deterministic k-means (numpy, driver-side over a sample) — the
    coarse quantizer. Seeded by evenly-spaced sample points, not RNG."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    idx = np.linspace(0, len(X) - 1, n_cells).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(n_cells):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(0)
    return C


def _assign_math(V, C):
    """Nearest-centroid cell per row of a (n, dim) float64 batch — shared
    by the fused scan, the index build, and the serial oracle replica, so
    assignments are bit-identical by construction. Batch-size-invariant:
    reductions run over the fixed vector axis only (see _ivf_math)."""
    import numpy as np

    d = np.stack([((V - c) ** 2).sum(axis=1) for c in C], axis=1)
    return d.argmin(axis=1)


def _ivf_math(V, C, q):
    """Per-row cell assignment + cosine vs q for a (n, dim) float64 batch —
    the ONE kernel both the distributed assign/score stage and the serial
    oracle replica run, so results are bit-identical by construction.
    Batch-size-invariant on purpose: every reduction is ``sum(axis=1)``
    over the fixed-length vector axis (numpy's pairwise summation order
    depends only on that length), never a BLAS gemm (whose blocking — and
    thus FP reassociation — varies with the batch dimension). A near-tie
    argmin must not flip between Arrow batch sizes."""
    return _assign_math(V, C), _cos_math(V, q)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    sample: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: (1) train a coarse quantizer on a bounded driver-side
    sample, (2) assign every row to its nearest centroid and score the
    probed cells in ONE Arrow-batched numpy pass (map-only, no shuffle —
    an expression-tree version of the per-cell fold runs as INTERPRETED
    higher-order lambdas, the measured-8x pitfall from the minhash
    signatures; a (batch × cells) numpy kernel is the vectorized-UDF
    case), (3) global top-k over the ~n/cells surviving rows. Recall < 1
    by design; the recall gate lives in tests (vs brute force)."""
    import numpy as np

    # hash-spread, order-stable sample (TakeOrderedAndProject — a top-k,
    # not a full sort): limit() alone takes whatever partitions answer
    # first (nondeterministic across runs/cluster sizes), and ordering by
    # raw id takes the LOWEST ids — at corpus scale that is one ingest/
    # content slice, a biased quantizer. Ordering by xxhash64(id) walks a
    # uniform pseudo-random permutation of the corpus, deterministic for
    # any partitioning (serial replica: functions/hashing.xxhash64_long,
    # proven bit-identical to the builtin in tests/test_hashing.py).
    rows = (
        df.select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample)
        .collect()
    )
    C = _kmeans_lite([r.v for r in rows], n_cells)
    q = np.asarray(query_vec, dtype=np.float64)
    probe_cells = np.asarray(
        sorted(np.argsort(((C - q) ** 2).sum(1))[:nprobe].tolist())
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def assign_score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            cell, cos = _ivf_math(V, C, q)
            keep = np.isin(cell, probe_cells)
            yield pd.DataFrame(
                {"vec_id": pdf["id"].to_numpy()[keep], "cos": cos[keep]}
            )

    from etlpy_spark.operators.dedup import _spread

    scored = (
        _spread(df)
        .select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .mapInPandas(assign_score, schema=f"vec_id {id_type}, cos double")
    )
    return _rank_topk(scored, k).select(
        "vec_id", "rank", F.round("cos", 6).alias("cos")
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: build once, query many. ``ivf_topk`` above re-trains
# the quantizer and re-scans the whole corpus per call — fine as a one-shot
# convenience, wrong for a 100 TB *query workload*. The index materializes
# the cell assignment to cell-partitioned parquet; a query then reads ONLY
# its nprobe probed cells' files, turning O(corpus) per query into
# O(corpus / n_cells x nprobe).


class IvfIndex:
    """Handle to a persisted IVF index directory:

    - ``<path>/centroids.json`` — quantizer centroids + id column type
      (KBs; loaded on the driver per query);
    - ``<path>/data/cell=<c>/...parquet`` — (vec_id, v) rows partitioned
      by coarse cell, written once by :func:`build_ivf_index`.

    At cluster scale the data dirs live on shared storage and the
    partition layout IS the pruning mechanism: a query lists nprobe
    directories, never the corpus."""

    def __init__(self, path: str, centroids, id_type: str):
        import numpy as np

        self.path = path
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.id_type = id_type

    @property
    def data_dir(self) -> str:
        import os

        return os.path.join(self.path, "data")

    def cell_dir(self, cell: int) -> str:
        import os

        return os.path.join(self.data_dir, f"cell={int(cell)}")


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    sample: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> IvfIndex:
    """Train the coarse quantizer (same deterministic hash-spread sample
    as ``ivf_topk``) and materialize every row's cell assignment to
    cell-partitioned parquet in ONE map-only Arrow pass + write. The
    assignment kernel is the exact one the fused path runs, so
    ``query_ivf(build_ivf_index(df), q)`` ≡ ``ivf_topk(df, q)`` for the
    same geometry — bit-identical, not approximately."""
    import json
    import os

    spark = df.sparkSession
    rows = (
        df.select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample)
        .collect()
    )
    C = _kmeans_lite([r.v for r in rows], n_cells)
    id_type = df.schema[id_col].dataType.simpleString()

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"].to_numpy(),
                    "v": pdf["v"].to_numpy(),
                    "cell": _assign_math(V, C).astype(np.int32),
                }
            )

    from etlpy_spark.operators.dedup import _spread

    assigned = (
        _spread(df)
        .select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .mapInPandas(assign, schema=f"vec_id {id_type}, v array<double>, cell int")
    )
    os.makedirs(path, exist_ok=True)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(path, "data")
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(
            {"n_cells": int(n_cells), "id_type": id_type, "centroids": C.tolist()},
            f,
        )
    return IvfIndex(path, C, id_type)


def load_ivf_index(path: str) -> IvfIndex:
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        meta = json.load(f)
    return IvfIndex(path, meta["centroids"], meta["id_type"])


def probe_cells(index: IvfIndex, query_vec: list[float], nprobe: int) -> list[int]:
    """The nprobe cells nearest the query — driver-side over the (tiny)
    centroid matrix; deterministic (distance then cell id)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    d = ((index.centroids - q) ** 2).sum(1)
    return sorted(np.argsort(d, kind="stable")[:nprobe].tolist())


def query_ivf(
    spark,
    index: IvfIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k over a persisted IVF index, touching ONLY the nprobe probed
    cells' files: the reader is constructed over exactly those partition
    directories (no reliance on runtime pruning — the file listing itself
    is O(nprobe)). Scoring runs the same batch-size-invariant cosine
    kernel as the fused path and brute force."""
    import os

    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    cells = probe_cells(index, query_vec, nprobe)
    dirs = [index.cell_dir(c) for c in cells]
    dirs = [d for d in dirs if os.path.isdir(d)]  # empty cells have no dir
    if not dirs:
        return spark.createDataFrame(
            [], f"vec_id {index.id_type}, rank int, cos double"
        )
    pruned = spark.read.option("basePath", index.data_dir).parquet(*dirs)

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cos": _cos_math(V, q)}
            )

    scored = pruned.select("vec_id", "v").mapInPandas(
        score, schema=f"vec_id {index.id_type}, cos double"
    )
    return _rank_topk(scored, k).select(
        "vec_id", "rank", F.round("cos", 6).alias("cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the BYTES scale path. IVF prunes which rows a
# query touches; PQ shrinks what each row costs — a dim-d float32 embedding
# becomes m uint8 codes (dim*4 -> m bytes, 32x at d=64/m=8), and queries
# scan codes with an ADC lookup table (one table build per query, one
# uint8 gather + sum per row; no float vector is ever materialized). At
# 100 TB the two compose: cell-partition the CODES table with the IVF
# quantizer and a query reads nprobe directories of m-byte rows.


def _pq_assign_math(V, codebook):
    """(n, dim) float64 batch -> (n, m) uint8 codes. Per-subspace nearest
    centroid via the shared batch-size-invariant kernel (_assign_math), so
    the distributed encoder and the serial replica are bit-identical."""
    import numpy as np

    m, _ks, dsub = codebook.shape
    codes = np.empty((V.shape[0], m), dtype=np.uint8)
    for j in range(m):
        codes[:, j] = _assign_math(V[:, j * dsub : (j + 1) * dsub], codebook[j])
    return codes


def _pq_adc_math(codes, lut):
    """(n, m) uint8 codes + (m, ks) query LUT -> (n,) ADC squared-L2
    distances. Summation over the fixed m axis only (batch-invariant)."""
    import numpy as np

    n, m = codes.shape
    return lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)


def _pq_lut(q, codebook):
    """Query -> (m, ks) table of squared L2 distances to every subspace
    centroid: ADC distance(q, decode(code)) = sum_j lut[j, code_j]."""
    import numpy as np

    m, ks, dsub = codebook.shape
    q = np.asarray(q, dtype=np.float64)
    return np.stack(
        [((codebook[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
         for j in range(m)]
    )


class PQIndex:
    """Handle to a persisted PQ index directory:

    - ``<path>/codebook.json`` — (m, ks, dsub) subspace centroids + id
      column type (KBs; loaded on the driver per query);
    - ``<path>/codes/...parquet`` — (vec_id, code binary) rows, m bytes
      per vector, written once by :func:`build_pq_index`."""

    def __init__(self, path: str, codebook, id_type: str):
        import numpy as np

        self.path = path
        self.codebook = np.asarray(codebook, dtype=np.float64)
        self.id_type = id_type

    @property
    def codes_dir(self) -> str:
        import os

        return os.path.join(self.path, "codes")


def train_pq(df: DataFrame, m: int = 8, ks: int = 256, sample: int = 512,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """Train the (m, ks, dsub) PQ codebook on the same deterministic
    hash-spread sample build_ivf_index uses: split the vector into m
    equal subspaces, k-means each independently (_kmeans_lite — seeded by
    evenly spaced sample points, no RNG). ks<=256 keeps codes uint8."""
    import numpy as np

    if not (1 <= ks <= 256):
        raise ValueError("PQ: ks must be in [1, 256] for uint8 codes")
    rows = (
        df.select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample)
        .collect()
    )
    X = np.asarray([r.v for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
    dsub = dim // m
    ks_eff = min(ks, len(X))
    codebook = np.stack(
        [_kmeans_lite(X[:, j * dsub : (j + 1) * dsub], ks_eff)
         for j in range(m)]
    )
    return codebook


def pq_encode(df: DataFrame, codebook, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """(id, vector) -> (vec_id, code binary): one map-only Arrow pass,
    m bytes per row. The 100 TB shape: this is the ONLY pass that ever
    reads the float vectors; everything downstream scans codes."""
    import numpy as np

    C = np.asarray(codebook, dtype=np.float64)
    id_type = df.schema[id_col].dataType.simpleString()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            codes = _pq_assign_math(V, C)
            yield pd.DataFrame({
                "vec_id": pdf["id"].to_numpy(),
                "code": [c.tobytes() for c in codes],
            })

    from etlpy_spark.operators.dedup import _spread

    return (
        _spread(df)
        .select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .mapInPandas(enc, schema=f"vec_id {id_type}, code binary")
    )


def build_pq_index(df: DataFrame, path: str, m: int = 8, ks: int = 256,
                   sample: int = 512, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> PQIndex:
    """Train + encode + persist. codes/ is a plain parquet table of
    (vec_id, m-byte code) — dictionary/RLE friendly, and readable with
    column pruning so a query's scan bytes are O(n·m), never O(n·dim)."""
    import json
    import os

    codebook = train_pq(df, m=m, ks=ks, sample=sample,
                        vec_col=vec_col, id_col=id_col)
    id_type = df.schema[id_col].dataType.simpleString()
    os.makedirs(path, exist_ok=True)
    pq_encode(df, codebook, vec_col=vec_col, id_col=id_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "codebook.json"), "w") as f:
        json.dump({"id_type": id_type, "codebook": codebook.tolist()}, f)
    return PQIndex(path, codebook, id_type)


def load_pq_index(path: str) -> PQIndex:
    import json
    import os

    with open(os.path.join(path, "codebook.json")) as f:
        meta = json.load(f)
    return PQIndex(path, meta["codebook"], meta["id_type"])


def query_pq(spark, index: PQIndex, query_vec: list[float], k: int = 10,
             rerank: int = 0, vectors: DataFrame | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ADC top-k over the codes table: the driver builds the (m, ks) LUT
    once, every task gathers+sums uint8 codes against it, and the global
    top-k is TakeOrderedAndProject (ascending ADC distance, vec_id
    tie-break) — the same no-unpartitioned-Window shape as the cosine
    paths.

    Pure ADC ranking is approximate by construction (quantization error;
    on structureless vectors, distance concentration makes fine ranking
    unrecoverable from m bytes). The production pattern is
    prune-then-rerank: pass ``rerank=R`` and the float ``vectors`` table
    and the ADC scan only PRUNES to R candidate ids; those R rows are
    fetched by a broadcast join (R rows — tiny) and ranked by EXACT
    squared L2. Final recall@k then equals ADC recall@R, gated in tests.
    At 100 TB: codes scan O(n·m) bytes, exact math touches R rows."""
    import numpy as np

    lut = _pq_lut(np.asarray(query_vec, dtype=np.float64), index.codebook)
    m = index.codebook.shape[0]

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([
                np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]
            ])
            if codes.shape[1] != m:
                raise ValueError("PQ: code width disagrees with the codebook")
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "adc": _pq_adc_math(codes, lut),
            })

    codes_df = spark.read.parquet(index.codes_dir)
    scored = codes_df.select("vec_id", "code").mapInPandas(
        score, schema=f"vec_id {index.id_type}, adc double"
    )
    if rerank and vectors is not None:
        if rerank < k:
            raise ValueError("PQ: rerank candidate count must be >= k")
        q = np.asarray(query_vec, dtype=np.float64)
        cands = scored.orderBy(F.col("adc").asc(), F.col("vec_id")).limit(rerank)
        fetched = vectors.select(
            F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
        ).join(F.broadcast(cands.select("vec_id")), "vec_id")

        def exact(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "dist": ((V - q) ** 2).sum(axis=1),
                })

        exact_scored = fetched.mapInPandas(
            exact, schema=f"vec_id {index.id_type}, dist double"
        )
        topk = exact_scored.orderBy(F.col("dist").asc(), F.col("vec_id")).limit(k)
        w = Window.orderBy(F.col("dist").asc(), F.col("vec_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "vec_id", "rank", F.round("dist", 6).alias("dist")
        )
    topk = scored.orderBy(F.col("adc").asc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("adc").asc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "rank", F.round("adc", 6).alias("adc")
    )


# ---------------------------------------------------------------------------
# IVF×PQ: the composition — rows pruned by coarse cell (IVF), bytes
# shrunk by residual product codes (PQ). A query lists nprobe partition
# directories of m-byte rows: scan cost O(n/cells · nprobe · m) bytes.
# Residual encoding (codes quantize v - centroid[cell], the faiss IVFPQ
# layout) spends the codebook's resolution on within-cell structure.


class IvfPqIndex:
    """Handle to a persisted IVF×PQ index directory:

    - ``<path>/meta.json`` — coarse centroids + (m, ks, dsub) residual
      codebook + id type (KBs, driver-side);
    - ``<path>/codes/cell=<c>/...parquet`` — (vec_id, code binary) rows,
      m bytes per vector, partitioned by coarse cell."""

    def __init__(self, path: str, centroids, codebook, id_type: str):
        import numpy as np

        self.path = path
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.codebook = np.asarray(codebook, dtype=np.float64)
        self.id_type = id_type

    @property
    def codes_dir(self) -> str:
        import os

        return os.path.join(self.path, "codes")

    def cell_dir(self, cell: int) -> str:
        import os

        return os.path.join(self.codes_dir, f"cell={int(cell)}")


def build_ivfpq_index(df: DataFrame, path: str, n_cells: int = 16,
                      m: int = 8, ks: int = 256, sample: int = 512,
                      vec_col: str = "embedding", id_col: str = "vec_id"
                      ) -> IvfPqIndex:
    """Train the coarse quantizer and the RESIDUAL PQ codebook on the
    same deterministic hash-spread sample, then assign + encode the whole
    corpus in ONE map-only Arrow pass and write codes partitioned by
    cell. The float vectors are read exactly once, ever."""
    import json
    import os

    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample)
        .collect()
    )
    X = np.asarray([r.v for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
    if not (1 <= ks <= 256):
        raise ValueError("PQ: ks must be in [1, 256] for uint8 codes")
    C = _kmeans_lite(X, n_cells)
    resid = X - C[_assign_math(X, C)]
    dsub = dim // m
    ks_eff = min(ks, len(X))
    codebook = np.stack(
        [_kmeans_lite(resid[:, j * dsub : (j + 1) * dsub], ks_eff)
         for j in range(m)]
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            cells = _assign_math(V, C)
            codes = _pq_assign_math(V - C[cells], codebook)
            yield pd.DataFrame({
                "vec_id": pdf["id"].to_numpy(),
                "code": [c.tobytes() for c in codes],
                "cell": cells.astype(np.int32),
            })

    from etlpy_spark.operators.dedup import _spread

    encoded = (
        _spread(df)
        .select(F.col(id_col).alias("id"), _vec(vec_col).alias("v"))
        .mapInPandas(enc, schema=f"vec_id {id_type}, code binary, cell int")
    )
    os.makedirs(path, exist_ok=True)
    encoded.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"id_type": id_type, "centroids": C.tolist(),
                   "codebook": codebook.tolist()}, f)
    return IvfPqIndex(path, C, codebook, id_type)


def load_ivfpq_index(path: str) -> IvfPqIndex:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return IvfPqIndex(path, meta["centroids"], meta["codebook"],
                      meta["id_type"])


def _ivfpq_luts(q, centroids, codebook, cells):
    """Per probed cell: the residual-space ADC table for q. The exact
    IVFPQ identity: d(q, c + r) = || (q - c) - r ||^2, so each cell's LUT
    is _pq_lut(q - centroid[cell])."""
    import numpy as np

    return {int(c): _pq_lut(np.asarray(q, dtype=np.float64) - centroids[c],
                            codebook)
            for c in cells}


def query_ivfpq(spark, index: IvfPqIndex, query_vec: list[float],
                k: int = 10, nprobe: int = 4, rerank: int = 0,
                vectors: DataFrame | None = None,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Top-k over the IVF×PQ index: the reader is constructed over
    exactly the nprobe probed cells' directories (file listing is
    O(nprobe), like query_ivf), each task gathers m-byte codes against
    its row's per-cell residual LUT, and the global k-selection is
    TakeOrderedAndProject. ``rerank=R`` + ``vectors`` upgrades to the
    prune-then-rerank contract (exact L2 over R fetched rows)."""
    import os

    import numpy as np

    qd = ((index.centroids - np.asarray(query_vec, dtype=np.float64)) ** 2).sum(1)
    cells = sorted(np.argsort(qd, kind="stable")[:nprobe].tolist())
    luts = _ivfpq_luts(query_vec, index.centroids, index.codebook, cells)
    dirs = [index.cell_dir(c) for c in cells if os.path.isdir(index.cell_dir(c))]
    if not dirs:
        col = "dist" if rerank and vectors is not None else "adc"
        return spark.createDataFrame(
            [], f"vec_id {index.id_type}, rank int, {col} double"
        )
    pruned = spark.read.option("basePath", index.codes_dir).parquet(*dirs)
    m = index.codebook.shape[0]

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([
                np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]
            ])
            if codes.shape[1] != m:
                raise ValueError("PQ: code width disagrees with the codebook")
            cell_ids = pdf["cell"].to_numpy()
            adc = np.empty(len(pdf), dtype=np.float64)
            for c in np.unique(cell_ids):
                mask = cell_ids == c
                adc[mask] = _pq_adc_math(codes[mask], luts[int(c)])
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "adc": adc})

    scored = pruned.select("vec_id", "code", "cell").mapInPandas(
        score, schema=f"vec_id {index.id_type}, adc double"
    )
    if rerank and vectors is not None:
        if rerank < k:
            raise ValueError("PQ: rerank candidate count must be >= k")
        q = np.asarray(query_vec, dtype=np.float64)
        cands = scored.orderBy(F.col("adc").asc(), F.col("vec_id")).limit(rerank)
        fetched = vectors.select(
            F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
        ).join(F.broadcast(cands.select("vec_id")), "vec_id")

        def exact(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "dist": ((V - q) ** 2).sum(axis=1),
                })

        exact_scored = fetched.mapInPandas(
            exact, schema=f"vec_id {index.id_type}, dist double"
        )
        topk = exact_scored.orderBy(F.col("dist").asc(), F.col("vec_id")).limit(k)
        w = Window.orderBy(F.col("dist").asc(), F.col("vec_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "vec_id", "rank", F.round("dist", 6).alias("dist")
        )
    topk = scored.orderBy(F.col("adc").asc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("adc").asc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "rank", F.round("adc", 6).alias("adc")
    )
