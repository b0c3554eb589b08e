"""Similarity search over the `embeddings` table (array<float> column).

Two paths, per the scale doctrine:

- x3 brute-force cosine top-k — the exactness baseline. Query set is tiny
  (broadcast); the corpus streams once. Dot products are sequential
  double folds (Spark `aggregate` ≡ DuckDB `list_reduce`), which makes
  the oracle comparison EXACT — identical fold order ⇒ identical bits ⇒
  identical ranking.
- x3b LSH-bucketed ANN — the 100 TB path. Random-hyperplane signatures
  (deterministic ±1 planes derived from xxhash64 bits, no RNG state to
  ship) bucket the corpus; candidates are searched within the query's
  bucket only. Recall vs brute force is asserted in tests/test_functions.py.

Oracle-compared scoring (x3) is built-in expressions — the fold/array
lambdas run in the JVM with a fold order DuckDB reproduces bit-for-bit.
Everything rows-only (LSH bucket assignment, IVF/PQ encode + ADC, x2d
candidate scoring) uses Arrow-batched pandas UDFs doing one numpy
matmul/einsum per batch — the vectorized exception the scale doctrine
allows, ~10-100× the interpreted higher-order-function folds they
replaced.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.registry import query, track_persist
from ..operators.helpers import round2, sql_round2

N_QUERIES = 5  # vec_id < 5 are the probe vectors
TOP_K = 5


def _dot(a: str, b: str) -> str:
    """Sequential left-fold double dot product (Spark SQL expression)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _duck_dot(a: str, b: str) -> str:
    """The same fold in DuckDB — identical order ⇒ identical bits."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def with_norm(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "embedding",
        F.sqrt(F.expr(_dot("embedding", "embedding"))).alias("nrm"),
    ).where(F.col("nrm") > 0)


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k of `queries` against `emb` (both with nrm).

    The query side is broadcast (a handful of probe rows even at scale);
    the corpus is scanned once — no shuffle of the corpus at all.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    cos = (F.expr(_dot("q_emb", "embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
        "cos"
    )
    scored = joined.select("qid", F.col("vec_id").alias("cid"), cos)
    return _topk_ranked(scored, k)


@query(
    "x3_cosine_topk",
    oracle=f"""
    WITH normed AS (
        SELECT vec_id, embedding,
               sqrt({_duck_dot('embedding', 'embedding')}) AS nrm
        FROM embeddings
        WHERE sqrt({_duck_dot('embedding', 'embedding')}) > 0
    ),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               {_duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cos
        FROM normed q JOIN normed c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT qid, cid, rank, {sql_round2('cos')} AS cos FROM (
        SELECT qid, cid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K} ORDER BY qid, rank
    """,
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return cosine_topk(emb, queries).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# X3b — LSH-bucketed ANN, multi-table random-hyperplane style. Each of
# N_TABLES tables assigns a BITS_PER_TABLE-bit bucket (sign of projections
# onto pseudo-random ±1 hyperplanes derived from xxhash64 parity bits —
# fully deterministic, nothing random to broadcast). A corpus vector is a
# candidate if it shares ANY table's bucket with the query. Neighbor
# search joins on (table, bucket): the pair work is corpus × bucket-size ×
# tables, never corpus². Recall/coverage trades off via (tables, bits).
# ---------------------------------------------------------------------------

# Tuned for weakly-clustered corpora (testdata top-5 cosines ≈ 0.35 ⇒
# per-plane agreement ≈ 0.62): 8 tables × 4 bits gives ~0.7 recall of the
# true top-5. Tightly-clustered real embeddings warrant more bits per
# table (smaller candidate sets) — the tradeoff knobs are these two.
N_TABLES = 8
BITS_PER_TABLE = 4

# Near-dup detection (x2d) hashes MUCH tighter than top-k search: a
# cos ≥ 0.95 pair agrees per hyperplane w.p. 1 − θ/π ≈ 0.90, so 12-bit
# buckets keep ~0.9^12 ≈ 0.28 per-table collision for true near-dups
# (≈ 0.93 recall across 8 tables) while random pairs (cos ≈ 0.35,
# per-plane ≈ 0.62) collide at 0.62^12 ≈ 0.3% per table — with 4-bit
# buckets the candidate set was ~40% of ALL pairs (measured 809k of 2M
# at sf0.1), i.e. the bucket join had quietly become all-pairs.
NEAR_DUP_BITS = 12


def _plane_signs(spark: SparkSession, n_planes: int, dim: int):
    """(n_planes, dim) ±1 hyperplane matrix from xxhash64 parity bits.

    The signs come from Spark's own xxhash64 (one tiny driver-side job
    over n_planes × dim ids) so the hyperplanes are deterministic and
    engine-derived — nothing random to persist or broadcast, and any
    executor/rebuild reproduces the identical planes."""
    import numpy as np

    rows = (
        spark.range(n_planes * dim)
        .select(
            (
                F.xxhash64(
                    (F.col("id") / dim).cast("int"), (F.col("id") % dim).cast("int")
                ).bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias("s")
        )
        .collect()
    )
    return np.array([r["s"] for r in rows], dtype=np.float64).reshape(n_planes, dim)


def lsh_tables(
    emb: DataFrame, bits_per_table: int = BITS_PER_TABLE
) -> DataFrame:
    """One row per (vector, table): vec_id, embedding, nrm, table, bucket.

    Bucket assignment is one Arrow-batched matmul per batch — all
    N_TABLES × bits_per_table projections at once — replacing the
    earlier per-plane interpreted SQL folds (higher-order functions
    never enter whole-stage codegen, so 96 separate 64-element folds
    per row were the dominant cost of the near-dup pipeline). Same
    shape as the IVF assignment pass: driver holds the tiny plane
    matrix, the corpus streams once."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:  # empty corpus: preserve schema, no rows
        return emb.select(
            "vec_id",
            "embedding",
            "nrm",
            F.lit(0).alias("table"),
            F.lit(0).cast("long").alias("bucket"),
        ).where(F.lit(False))
    n_planes = N_TABLES * bits_per_table
    S = _plane_signs(spark, n_planes, int(first["d"]))
    weights = (1 << np.arange(bits_per_table)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(col: pd.Series) -> pd.Series:
        import numpy as np

        M = np.array(col.tolist(), dtype=np.float64)  # (B, dim)
        bits = (M @ S.T > 0).astype(np.int64)  # (B, n_planes)
        bk = bits.reshape(len(M), N_TABLES, bits_per_table) @ weights
        return pd.Series(list(bk))

    return emb.select(
        "vec_id",
        "embedding",
        "nrm",
        F.posexplode(_buckets("embedding")).alias("table", "bucket"),
    )


def _pair_cosine(a, b):
    """Row-wise dot product of two array columns as ONE vectorized numpy
    pass per Arrow batch. The candidate-scoring kernel for near-dup
    detection (x2d): each batch of candidate pairs becomes two (B, dim)
    matrices and one einsum — no per-element interpreted SQL fold.
    Pairwise float64 summation (numpy) instead of a sequential fold; at
    dim 64 the two differ below 1e-12 relative, far under the 0.95
    near-dup threshold's meaningful precision."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dotpairs(xa: pd.Series, xb: pd.Series) -> pd.Series:
        A = np.array(xa.tolist(), dtype=np.float64)
        B = np.array(xb.tolist(), dtype=np.float64)
        if len(A) == 0:
            return pd.Series(np.zeros(0))
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _dotpairs(a, b)


@query("x2d_embedding_near_dup")
def x2d_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup method):
    LSH-bucket candidates (any shared table bucket), exact cosine on
    candidates only, keep pairs with cos ≥ 0.95. Never all-pairs — the
    same bucket-join shape as the text near-dup ops.

    The candidate pass carries ONLY (vec_id, table, bucket): pairs found
    in several tables are deduped on the 16-byte id pair, and the full
    embedding arrays are joined back just for the exact-cosine scoring
    of the (much smaller) deduped candidate set. At 100 TB the bucket
    join and the distinct shuffle ids, never array payloads.
    """
    from .dedup import MAX_BUCKET, cap_buckets

    normed = with_norm(load(spark, sf_dir, "embeddings"))
    # The (vec_id, table, bucket) frame is the LSH index: two join sides
    # read it and the 96-plane Arrow matmul assignment behind it is the
    # expensive part, so materialize it once (production: a written
    # index table).
    keys = cap_buckets(
        lsh_tables(normed, bits_per_table=NEAR_DUP_BITS).select(
            "vec_id", "table", "bucket"
        ),
        ["table", "bucket"],
        MAX_BUCKET,
    )
    keys = track_persist(keys)
    a = keys.select(F.col("vec_id").alias("vec_a"), "table", "bucket")
    b = keys.select(F.col("vec_id").alias("vec_b"), "table", "bucket")
    pair_ids = (
        a.join(b, ["table", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    emb_a = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    emb_b = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    # Parallelism guard for the scoring stage: the candidate set is small
    # in BYTES (id pairs + two 64-float arrays), so AQE coalesces the
    # post-join shuffle read down to 1-2 partitions; explicit
    # numPartitions keeps the Arrow scoring batches spread across the
    # executors (and is exempt from AQE coalescing).
    pairs = (
        pair_ids.join(emb_a, "vec_a")
        .join(emb_b, "vec_b")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # Exact cosine via one Arrow-batched numpy row-wise dot per batch —
    # the same vectorized shape as the bucket-assignment matmul above.
    # x2d is rows-only (no SQL oracle pins fold-order bits), so nothing
    # requires the interpreted aggregate() fold that x3's bitwise-exact
    # oracle comparison does; that fold was the slowest stage in the
    # repo (VERDICT r06: 8.7 s median at sf0.1, CPU-bound per element).
    cos = _pair_cosine("emb_a", "emb_b") / (F.col("nrm_a") * F.col("nrm_b"))
    # Threshold on the RAW cosine; round only for display. Filtering the
    # rounded value would admit a [0.945, 0.95) band of non-near-dups.
    return (
        pairs.where(cos >= 0.95)
        .select("vec_a", "vec_b", round2(cos).alias("cos"))
        .orderBy("vec_a", "vec_b")
    )


def _topk_ranked(scored, k: int = None):
    """(qid, cid, cos) → per-query top-k: the ONE definition of the
    tie-breaking (cos desc, cid) and display rounding that every ANN
    variant (x3b LSH, x3c IVF probe, x3d/x3e exact re-rank) and the
    brute-force oracle tail must agree on — a drift here silently breaks
    the cross-variant recall comparisons."""
    from pyspark.sql import Window

    if k is None:
        k = TOP_K
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "rank", round2("cos").alias("cos"))
        .orderBy("qid", "rank")
    )


@query("x3b_ann_lsh")
def x3b_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k. The candidate dedup (a vector found in
    several of the query's buckets) happens on (qid, vec_id) ids only;
    the query vectors (broadcast, tiny) and the corpus embeddings are
    joined back for scoring after the distinct — the shuffle carries id
    pairs, not array payloads."""
    from pyspark.sql import Window

    normed = with_norm(load(spark, sf_dir, "embeddings"))
    keys = lsh_tables(normed).select("vec_id", "table", "bucket")
    q_keys = keys.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "table", "bucket"
    )
    cand_ids = (
        keys.join(F.broadcast(q_keys), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()  # de-dup vectors found in several tables
    )
    q_emb = normed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = cand_ids.join(normed, "vec_id").join(F.broadcast(q_emb), "qid")
    cos = (F.expr(_dot("q_emb", "embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
        "cos"
    )
    scored = cand.select("qid", F.col("vec_id").alias("cid"), cos)
    return _topk_ranked(scored)


# ---------------------------------------------------------------------------
# X3c — IVF ANN: k-means coarse quantizer splits the corpus into nlist
# cells; each query probes its nprobe nearest centroids and scores cosine
# only within those cells. FAISS-style build: the quantizer trains on a
# bounded deterministic sample (k-means needs ~nlist×256 points, not the
# corpus), so only the cell ASSIGNMENT is a distributed pass. The classic
# alternative to x3b's LSH.
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4
IVF_TRAIN_MAX = 4096  # quantizer training sample cap
IVF_ITERS = 10


def _lloyd(X, k: int, iters: int):
    """Deterministic numpy Lloyd iterations; init = first k sample rows
    (the sample is already hash-shuffled). Empty cells keep their old
    center. Ties in argmin break to the lowest cell index."""
    import numpy as np

    k = min(k, len(X))
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def assign_cells(emb: DataFrame, centers) -> DataFrame:
    """Assign each vector to its nearest coarse cell under FIXED
    centroids: one Arrow matmul per batch (the centroid matrix rides to
    executors in the UDF closure — nlist×dim floats), touching ONLY the
    rows of ``emb``. This is both the build-time corpus scan and the
    incremental-ingest admit step (x3f): FAISS ``IndexIVF.add`` is the
    same operation."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)
    c_sq = (C**2).sum(axis=1)  # argmin ||x-c||^2 == argmin ||c||^2 - 2 x.c

    @pandas_udf("int")
    def _cell(col: pd.Series) -> pd.Series:
        M = np.array(col.tolist(), dtype=np.float64)
        scores = c_sq[None, :] - 2.0 * (M @ C.T)
        return pd.Series(scores.argmin(axis=1).astype("int32"))

    return emb.select("vec_id", "embedding", "nrm", _cell("embedding").alias("cell"))


def ivf_assignments(emb: DataFrame, nlist: int = None):
    """Fit the coarse quantizer and return (assigned_df, centers).

    Build shape for 100 TB: training collects at most ``IVF_TRAIN_MAX``
    hash-sampled vectors to the driver (TakeOrdered over xxhash64 — one
    pass, deterministic, size-capped regardless of corpus size) and runs
    Lloyd there in microseconds; the corpus-wide work is a single
    Arrow-batched pandas-UDF scan assigning each vector to its nearest
    center via one matmul per batch (``assign_cells``). No multi-pass
    distributed fit, no MLlib JIT, nothing grows with the corpus except
    the one scan.
    """
    import numpy as np

    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"))
        .limit(IVF_TRAIN_MAX)
        .collect()
    )
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)
    C = _lloyd(X, nlist if nlist is not None else IVF_NLIST, IVF_ITERS)
    return assign_cells(emb, C), list(C)


def ivf_probe(spark: SparkSession, assigned: DataFrame, centers) -> DataFrame:
    """IVF search given a built index (assigned cells + centroids).

    Split from the build so the bench can time index construction (the
    KMeans fit — legitimately amortized over many queries) separately
    from per-query probe cost. ``assigned`` may be persisted by the
    caller; this function only reads it.
    """
    from pyspark.sql import Window

    # nprobe nearest cells per query vector — centers are tiny (nlist×dim),
    # so this is driver-side numpy over the collected probe vectors only.
    import numpy as np

    qrows = assigned.where(F.col("vec_id") < N_QUERIES).collect()
    cmat = np.array([c.toArray() if hasattr(c, "toArray") else c for c in centers])
    probe_rows = []
    for r in qrows:
        q = np.array(r["embedding"], dtype=np.float64)
        d = ((cmat - q) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:IVF_NPROBE]:
            probe_rows.append((r["vec_id"], int(cell)))
    probes = spark.createDataFrame(probe_rows, "qid long, cell int")

    q = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = (
        assigned.join(F.broadcast(probes), ["cell"])
        .join(F.broadcast(q), ["qid"])
        .where(F.col("vec_id") != F.col("qid"))
    )
    cos = (F.expr(_dot("q_emb", "embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
        "cos"
    )
    scored = cand.select("qid", F.col("vec_id").alias("cid"), cos)
    return _topk_ranked(scored)

@query("x3c_ann_ivf")
def x3c_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(load(spark, sf_dir, "embeddings"))
    assigned, centers = ivf_assignments(emb)
    # the IVF index: read by the probe-set collect AND the search join —
    # materialize once (production: a written table, like the LSH index)
    return ivf_probe(spark, track_persist(assigned), centers)


# ---------------------------------------------------------------------------
# X3f — incremental ANN ingest: admit a new batch of embeddings into a
# STANDING IVF index without retraining the quantizer or rescanning the
# corpus — the vector twin of x2f's incremental dedup (nobody rebuilds a
# 100 TB ANN index to admit one day of embeddings). FAISS IndexIVF.add
# is this exact operation: new vectors are assigned to their nearest
# EXISTING coarse cell (one Arrow matmul over the batch only — the
# broadcast centroid matrix is nlist×dim floats) and appended to the
# cell lists; probes then search the merged posting lists. Accuracy
# caveat, same as FAISS's: cells drift as the distribution shifts, so a
# production pipeline retrains/re-splits when batch volume since the
# last build passes a threshold; within one admit cycle recall matches
# the full rebuild (pinned by tests/test_functions.py).
# ---------------------------------------------------------------------------


@query("x3f_incremental_ann")
def x3f_incremental_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(load(spark, sf_dir, "embeddings"))
    # Deterministic ~5% "new today" batch; probe vectors stay standing
    # so the query set is identical to x3c's and results are comparable.
    is_new = (F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0) & (
        F.col("vec_id") >= N_QUERIES
    )
    standing, batch = emb.where(~is_new), emb.where(is_new)
    assigned, centers = ivf_assignments(standing)  # the standing index
    admitted = assign_cells(batch, centers)  # the incremental add
    merged = assigned.unionByName(admitted)
    return ivf_probe(spark, track_persist(merged), centers)


# ---------------------------------------------------------------------------
# X3d — product-quantization ANN with ADC scoring + exact re-rank. The
# memory story that makes 100 TB of embeddings searchable: each vector is
# compressed to PQ_M subspace centroid codes (8 bytes/vector here vs 256
# bytes of float32), the scan scores candidates from the CODES ONLY via
# per-query lookup tables (asymmetric distance computation — one table of
# PQ_M×PQ_K true sub-dot-products per query, built driver-side in
# microseconds), and only the top PQ_RERANK approximate hits per query are
# re-scored exactly against their full vectors. Composes with x3c's cell
# routing (classic IVFADC) — kept separate here so each index structure is
# independently testable.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim → 8 dims each)
PQ_K = 32  # centroids per subspace → 5-bit codes
PQ_RERANK = 60  # exact re-rank depth per query


def pq_train(X):
    """Per-subspace codebooks (PQ_M, PQ_K, dim/PQ_M) via the same
    deterministic Lloyd used by the IVF coarse quantizer."""
    import numpy as np

    sub = X.shape[1] // PQ_M
    return np.stack(
        [
            _lloyd(X[:, m * sub : (m + 1) * sub].copy(), PQ_K, IVF_ITERS)
            for m in range(PQ_M)
        ]
    )


def _pq_argmin_codes(M, books, b_sq):
    """(B, PQ_M) int32 codes: per-subspace nearest-centroid argmin, ties
    to the lowest code — the single encode kernel shared by plain PQ
    (x3d) and residual IVFADC (x3e)."""
    import numpy as np

    sub = books.shape[2]
    out = np.empty((len(M), PQ_M), dtype="int32")
    for m in range(PQ_M):
        S = M[:, m * sub : (m + 1) * sub]
        out[:, m] = (b_sq[m][None, :] - 2.0 * (S @ books[m].T)).argmin(axis=1)
    return out


def pq_encode(emb: DataFrame, books) -> DataFrame:
    """(vec_id, nrm, codes array<int>[PQ_M]) — one Arrow-batched numpy
    pass; ties in the per-subspace argmin break to the lowest code."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    b_sq = (books**2).sum(axis=2)  # (M, K)

    @pandas_udf("array<int>")
    def _codes(col: pd.Series) -> pd.Series:
        M = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(list(_pq_argmin_codes(M, books, b_sq)))

    return emb.select("vec_id", "nrm", _codes("embedding").alias("codes"))


def rerank_exact(shortlist: DataFrame, emb: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact-cosine top-k re-rank of (qid, cid) shortlist pairs: full
    vectors come back for the shortlist only, the query side broadcasts.
    Shared tail of every ADC-scored index (x3d, x3e) — identical
    tie-breaking and rounding to the brute-force oracle."""
    from pyspark.sql import Window

    corpus = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    q_emb = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    exact = (
        shortlist.join(corpus, "cid")
        .join(F.broadcast(q_emb), "qid")
        .select(
            "qid",
            "cid",
            (F.expr(_dot("q_emb", "c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
                "cos"
            ),
        )
    )
    return _topk_ranked(exact, k)


@query("x3d_ann_pq")
def x3d_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k: approx dot from codes + lookup tables, exact cosine
    re-rank of the top PQ_RERANK. Same output shape as x3; recall vs the
    brute-force oracle asserted in tests/test_functions.py. Rows-only (the
    codebooks are driver-trained numpy state no SQL engine reproduces)."""
    import numpy as np
    from pyspark.sql import Window

    emb = with_norm(load(spark, sf_dir, "embeddings"))
    sample = (
        emb.select("embedding")
        .orderBy(F.xxhash64("vec_id"))
        .limit(IVF_TRAIN_MAX)
        .collect()
    )
    books = pq_train(np.array([r["embedding"] for r in sample], dtype=np.float64))
    sub = books.shape[2]

    # the PQ index: codes + norms, 100× smaller than the vectors; scanned
    # by the ADC pass and (by ids only) the re-rank join
    encoded = track_persist(pq_encode(emb, books))

    qrows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).collect(), key=lambda r: r["vec_id"]
    )
    qids = [int(r["vec_id"]) for r in qrows]
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnrm = np.array([r["nrm"] for r in qrows])
    # ADC tables: T[q, m, k] = <query_q subspace m, codebook centroid k>
    T = np.stack(
        [Q[:, m * sub : (m + 1) * sub] @ books[m].T for m in range(PQ_M)], axis=1
    )

    # Map-side top-k (r14, guide §2.3): the old shape exploded the ADC
    # score array to one JVM row per (candidate, query) — corpus × Q
    # rows shuffled into the global rank window. The ADC kernel now
    # selects each batch's per-query top-PQ_RERANK itself (top-R of a
    # union of per-batch top-Rs == global top-R under the same total
    # order, so the shortlist is bit-identical), and the window ranks
    # only batches × Q × PQ_RERANK tiny rows.
    qid_np = np.array(qids, dtype=np.int64)

    def _adc_topk(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, M)
            ids_b = pdf["vec_id"].to_numpy(dtype=np.int64)
            nrm_b = pdf["nrm"].to_numpy(dtype=np.float64)
            acc = np.zeros((len(C), len(qids)))
            for m in range(PQ_M):
                acc += T[:, m, C[:, m]].T  # (B, Q)
            S = acc / (qnrm[None, :] * nrm_b[:, None])
            S[ids_b[:, None] == qid_np[None, :]] = -np.inf  # self-pairs out
            out_q, out_c, out_s = [], [], []
            for qi in range(len(qids)):
                col = S[:, qi]
                order = np.lexsort((ids_b, -col))[:PQ_RERANK]
                order = order[np.isfinite(col[order])]
                out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
                out_c.append(ids_b[order])
                out_s.append(col[order])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "cid": np.concatenate(out_c),
                    "approx_cos": np.concatenate(out_s),
                }
            )

    scored = encoded.mapInPandas(
        _adc_topk, "qid long, cid long, approx_cos double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("approx_cos").desc(), "cid")
    shortlist = (
        scored.withColumn("arank", F.row_number().over(w))
        .where(F.col("arank") <= PQ_RERANK)
        .select("qid", "cid")
    )
    return rerank_exact(shortlist, emb)


# ---------------------------------------------------------------------------
# X3e — IVFADC: the classic composition of x3c's coarse cell routing and
# x3d's PQ codes (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — the FAISS IndexIVFPQ shape). The index
# is one distributed Arrow scan producing (vec_id, nrm, cell, codes)
# where codes quantize the RESIDUAL x − centroid(cell) — residual
# encoding is what makes 5-bit subspace codes accurate enough, because
# the coarse quantizer has already removed most of the variance. At
# search time each query probes its nprobe nearest cells and scores ONLY
# those cells' rows, from codes alone: <q, x> ≈ <q, c_cell> + Σ_m
# T[q, m, code_m] (per-query lookup tables over the residual codebooks,
# built driver-side). Top PQ_RERANK approximate hits per query are then
# re-scored exactly. 100 TB shape: 8 B/vector index scanned only in the
# probed cells (nprobe/nlist of the corpus), candidate shuffle carries
# codes (8 ints) not embeddings, exact vectors touched for the shortlist
# only.
# ---------------------------------------------------------------------------


def ivfadc_index(emb: DataFrame):
    """Train coarse + residual-PQ quantizers (bounded driver sample) and
    encode the corpus in one Arrow pass. Returns (index_df, C, books)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    sample = (
        emb.select("embedding")
        .orderBy(F.xxhash64("vec_id"))
        .limit(IVF_TRAIN_MAX)
        .collect()
    )
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)
    C = _lloyd(X, IVF_NLIST, IVF_ITERS)
    c_sq = (C**2).sum(axis=1)
    cells = (c_sq[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
    books = pq_train(X - C[cells])  # residual codebooks
    sub = books.shape[2]
    b_sq = (books**2).sum(axis=2)  # (M, K)

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def _index(col: pd.Series) -> pd.DataFrame:
        M = np.array(col.tolist(), dtype=np.float64)
        cell = (c_sq[None, :] - 2.0 * (M @ C.T)).argmin(axis=1)
        codes = _pq_argmin_codes(M - C[cell], books, b_sq)
        return pd.DataFrame({"cell": cell.astype("int32"), "codes": list(codes)})

    idx = emb.select("vec_id", "nrm", _index("embedding").alias("ix")).select(
        "vec_id", "nrm", F.col("ix.cell").alias("cell"), F.col("ix.codes").alias("codes")
    )
    return idx, C, books


@query("x3e_ann_ivfadc")
def x3e_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-k: cell-routed ADC from residual codes + exact re-rank.
    Same output shape as x3/x3c/x3d; recall vs brute force (and vs x3c at
    the same nprobe budget) asserted in tests/test_functions.py.
    Rows-only: driver-trained numpy codebooks have no SQL twin."""
    emb = with_norm(load(spark, sf_dir, "embeddings"))
    idx, C, books = ivfadc_index(emb)
    # the standing index: the ADC scan and the shortlist re-join read it
    return ivfadc_probe(spark, track_persist(idx), C, books, emb)


def ivfadc_probe(spark: SparkSession, idx: DataFrame, C, books, emb: DataFrame) -> DataFrame:
    """IVFADC search given a built index — split from the build so the
    bench can time one-time index construction separately from the
    per-query probe cost (mirrors ivf_probe for x3c)."""
    import numpy as np
    from pyspark.sql import Window

    sub = books.shape[2]

    qrows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).collect(), key=lambda r: r["vec_id"]
    )
    qids = [int(r["vec_id"]) for r in qrows]
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnrm = np.array([r["nrm"] for r in qrows])
    # per-query ADC tables over the residual codebooks: T[q, m, k]
    T = np.stack(
        [Q[:, m * sub : (m + 1) * sub] @ books[m].T for m in range(PQ_M)], axis=1
    )
    # nprobe nearest cells per query + the <q, centroid> term of the score
    d = ((C[None, :, :] - Q[:, None, :]) ** 2).sum(axis=2)  # (Q, nlist)
    qdotc = Q @ C.T
    nlist = len(C)
    probed = np.zeros((len(qids), nlist), dtype=bool)
    for i in range(len(qids)):
        probed[i, np.argsort(d[i])[:IVF_NPROBE]] = True
    qid_np = np.array(qids, dtype=np.int64)

    # Map-side top-k (r14, guide §2.3/§4): the old shape broadcast a
    # (qid, cell) probe table, joined it to the index — one JVM row per
    # (candidate, probing query) — and ran a scalar Arrow UDF plus the
    # global rank window over all those pair rows. The kernel now scans
    # index batches directly: per query it masks the batch to probed
    # cells, scores from codes, and emits only the batch-local
    # top-PQ_RERANK (top-R of per-batch top-Rs == global top-R under
    # the same total order, so the shortlist is bit-identical); the
    # join, the pair-row explosion, and the wide window input are gone.
    def _adc_topk(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            Cd = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, M)
            ids_b = pdf["vec_id"].to_numpy(dtype=np.int64)
            nrm_b = pdf["nrm"].to_numpy(dtype=np.float64)
            cell_b = pdf["cell"].to_numpy(dtype=np.int64)
            out_q, out_c, out_s = [], [], []
            for qi in range(len(qid_np)):
                m_rows = probed[qi, cell_b] & (ids_b != qid_np[qi])
                if not m_rows.any():
                    continue
                sub = np.where(m_rows)[0]
                acc = np.zeros(len(sub))
                for m in range(PQ_M):
                    acc += T[qi, m, Cd[sub, m]]
                score = (qdotc[qi, cell_b[sub]] + acc) / (qnrm[qi] * nrm_b[sub])
                order = np.lexsort((ids_b[sub], -score))[:PQ_RERANK]
                out_q.append(np.full(len(order), qid_np[qi], dtype=np.int64))
                out_c.append(ids_b[sub][order])
                out_s.append(score[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "cid": np.concatenate(out_c),
                    "approx_cos": np.concatenate(out_s),
                }
            )

    scored = idx.select("vec_id", "nrm", "cell", "codes").mapInPandas(
        _adc_topk, "qid long, cid long, approx_cos double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("approx_cos").desc(), "cid")
    shortlist = (
        scored.withColumn("arank", F.row_number().over(w))
        .where(F.col("arank") <= PQ_RERANK)
        .select("qid", "cid")
    )
    return rerank_exact(shortlist, emb)


# ---------------------------------------------------------------------------
# X15 — SemDeDup-style semantic deduplication (Abbas et al. 2023,
# arXiv:2303.09540, public): k-means-cluster the embedding corpus, then
# prune near-duplicates ONLY within each cluster. The whole point of the
# technique at 100 TB is replacing the O(n^2) all-pairs cosine scan with
# k independent O((n/k)^2) per-cluster problems: nlist scales with the
# corpus (the paper runs ~100k clusters over LAION) so per-cluster size
# stays bounded, every cluster dedups in parallel with no cross-cluster
# shuffle, and the quantizer fit stays a capped driver-side sample
# (ivf_assignments — the same build the IVF ANN family uses).
#
# Within a cluster we run a deterministic greedy leader scan in vec_id
# order: a member joins the kept set iff its cosine to every
# previously-kept member is <= SEMDEDUP_THRESHOLD; otherwise it is
# dropped and records which leader absorbed it. (The paper's
# which-member-to-keep rule — farthest from centroid — is a tunable
# policy choice; lowest-id is the deterministic variant so the result
# is reproducible and oracle-testable. The DROP decision, cosine >
# threshold within a cluster, is the paper's.) Per-cluster work is one
# applyInPandas task: O(m * kept * dim) numpy dot products, no m x m
# matrix materialized, so memory stays linear in cluster size.
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.9


def semdedup(emb: DataFrame, threshold: float = SEMDEDUP_THRESHOLD) -> DataFrame:
    """Per-cluster greedy near-dup pruning under FIXED cluster centers.

    ``emb`` must carry (vec_id, embedding, nrm, cell) — i.e. the output
    of ``assign_cells``. Returns one row per input vector:
    (vec_id, cell, kept, dup_of, leader_sim) where dropped rows name
    the kept leader that absorbed them and the cosine to it.
    """
    import numpy as np

    out_schema = (
        "vec_id long, cell int, kept boolean, dup_of long, leader_sim double"
    )

    def _dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, ids, kept, dup_of, sim_to = _greedy_leader_scan(pdf, threshold)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy(dtype=np.int32),
                "kept": kept,
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup_of], dtype="Int64"
                ),
                "leader_sim": sim_to,
            }
        )

    return emb.groupBy("cell").applyInPandas(_dedup_cell, out_schema)


def _greedy_leader_scan(pdf: "pd.DataFrame", threshold: float):
    """Blocked-leader greedy (VERDICT r13 #5): the scan order and the
    keep/drop rule are EXACTLY the sequential greedy's — member i is
    dropped iff its max cosine against all previously-kept members
    exceeds the threshold, absorbed by the argmax leader (earliest kept
    wins ties) — but the dot products run as two matmuls per BLOCK
    (block × prior-leaders and block × block) instead of one per-row
    gemv, so the per-row Python work is a row slice over precomputed
    scores, not BLAS + list boxing."""
    import numpy as np

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    nrm = pdf["nrm"].to_numpy(dtype=np.float64)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    n = len(pdf)
    kept = np.zeros(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    sim_to = np.full(n, np.nan)
    leaders: list[int] = []  # kept row indices, in processing order
    B = 512
    for s in range(0, n, B):
        e = min(s + B, n)
        Mb, nb = M[s:e], nrm[s:e]
        if leaders:
            S_old = (Mb @ M[leaders].T) / (nb[:, None] * nrm[leaders][None, :])
            max_old = S_old.max(axis=1)
            arg_old = S_old.argmax(axis=1)
        S_blk = (Mb @ Mb.T) / (nb[:, None] * nb[None, :])
        blk_leaders: list[int] = []  # block-local kept indices
        for i in range(e - s):
            best_sim, best_row = -np.inf, -1
            if leaders:
                best_sim, best_row = max_old[i], leaders[arg_old[i]]
            if blk_leaders:
                srow = S_blk[i, blk_leaders]
                j = int(np.argmax(srow))
                # strict >: earlier (prior-block) leaders win ties,
                # matching the sequential argmax over the kept list
                if srow[j] > best_sim:
                    best_sim, best_row = srow[j], s + blk_leaders[j]
            if best_row >= 0 and best_sim > threshold:
                dup_of[s + i] = ids[best_row]
                sim_to[s + i] = best_sim
            else:
                kept[s + i] = True
                blk_leaders.append(i)
        leaders.extend(s + j for j in blk_leaders)
    return pdf, ids, kept, dup_of, sim_to


def semdedup_cell_stats(emb: DataFrame, threshold: float = SEMDEDUP_THRESHOLD) -> DataFrame:
    """Per-cluster funnel of the greedy near-dup pruning, aggregated
    INSIDE the kernel: one output row per cell instead of one per
    vector, so the Python boundary carries nlist rows, the per-vector
    frame never materializes, and the post-kernel groupBy exchange
    disappears (guide §2.3 applied at the kernel boundary). Keep/drop
    decisions are the same _greedy_leader_scan as ``semdedup``;
    equality of the two funnel forms is pinned by
    tests/test_r14_optimizations.py."""
    import numpy as np

    def _cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        _, _ids, kept, _dup_of, sim_to = _greedy_leader_scan(pdf, threshold)
        dropped = ~kept
        return pd.DataFrame(
            {
                "cell": pd.Series([cell], dtype="int32"),
                "members": pd.Series([len(kept)], dtype="int64"),
                "kept_n": pd.Series([int(kept.sum())], dtype="int64"),
                "dropped_n": pd.Series([int(dropped.sum())], dtype="int64"),
                "avg_dup_sim": pd.Series(
                    [float(np.mean(sim_to[dropped])) if dropped.any() else None],
                    dtype="float64",
                ),
            }
        )

    return emb.groupBy("cell").applyInPandas(
        _cell_stats,
        "cell int, members long, kept_n long, dropped_n long, avg_dup_sim double",
    )


@query("x15_semdedup")
def x15_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: cluster with the IVF coarse
    quantizer, keep-or-drop each vector within its cluster, and report
    the per-cluster funnel (members, kept, dropped, mean absorbed
    similarity) — the summary a curation pipeline logs. Rows-only
    (the greedy leader scan is not SQL-expressible); the keep/drop
    semantics are pinned by tests/test_functions.py planted-duplicate
    recall, kept-set validity, and determinism tests."""
    emb = with_norm(load(spark, sf_dir, "embeddings"))
    assigned, _centers = ivf_assignments(emb)
    stats = semdedup_cell_stats(assigned)
    return stats.select(
        "cell",
        "members",
        "kept_n",
        "dropped_n",
        round2(F.col("avg_dup_sim")).alias("avg_dup_sim"),
    ).orderBy("cell")


# ---------------------------------------------------------------------------
# X27 — contrastive hard-negative mining: for every anchor vector, the
# K most-similar vectors carrying a DIFFERENT label — the standard
# batch-construction stage for training embedding models (in-batch
# negatives are easy; retrieval quality comes from hard ones; e.g. DPR,
# Karpukhin et al. 2020; SimCSE's hard-negative variants — public).
#
# Scale shape: the SemDeDup discipline — anchors only compare within
# their IVF cell, so the all-pairs O(n²) collapses to Σ_cell |cell|²
# with the quantizer trained on a size-capped driver sample; the
# per-anchor top-k is a cell-local window (the partition key includes
# the cell by construction — no global sort). Cross-cell negatives are
# missed exactly like SemDeDup's cross-cluster dups; production raises
# nprobe/nlist to trade recall for pair work. Mining quality vs the
# exact different-label top-k is pinned by recall in tests (same
# methodology as the x3b/x3c recall bars).
#
# Default nprobe is MEASURED, not inherited, and at NON-DEGENERATE
# nlist (VERDICT r09 #3, r10 #4). Mean recall vs the exact
# different-label top-5 on the 10× replica fixture (20 000 vectors,
# the bench Part B perturbation scheme):
#
#   nlist= 64: 0.407 / 0.569 / 0.749 / 0.850 / 0.917
#              at nprobe 4 / 8 / 16 / 24 / 32
#   nlist=256: 0.409 / 0.518 / 0.650 / 0.774 / 0.902 / 0.979
#              at nprobe 4 / 8 / 16 / 32 / 64 / 128
#
# (The original nlist=16 curve — 0.58 / 0.82-0.83 / 1.00 at
# 4 / 8 / 16 on the sf fixtures — had a tautological top anchor:
# nprobe=16 probes all 16 cells. The 10× curve has no such point.)
# Two regularities the default is derived from: at equal nprobe/nlist
# fraction the FINER quantizer wins (256/32 reads 0.774 vs 64/16's
# 0.749 at half the pair work — classic IVF cell-granularity gain),
# and recall is driven by the probed fraction, not nprobe alone. The
# default is therefore nprobe = max(8, nlist // 4): measured 0.83 at
# (16, 8) on the sf fixtures, 0.749 at (64, 16) and 0.902 at
# (256, 64) on the 10× fixture — at-or-above the 0.75 bar at every
# measured point (the one at-bar point, (64, 16), sits on a mid-range
# nlist whose cells are coarse relative to the corpus; callers
# wanting margin there use 3·nlist/8 → 0.850 measured). Mining needs
# MOST of the true hardest negatives, not all (misses are replaced by
# slightly-easier hard negatives from probed cells, which DPR-style
# training tolerates — Karpukhin et al. 2020 use a single BM25
# negative, far weaker than a 0.75+-recall exact top-5); the last
# ~2× pair work to exact recall no longer changes the mined set
# materially. bench.py records the wall curve at default nlist and
# the recall curve at nlist ∈ {64, 256} on the 10× scaleup replicas.
#
# Rows-only: the quantizer is an iterative driver-sample fit, not
# one-statement SQL; determinism, label-correctness, recall-vs-brute,
# and planted-structure tests in tests/test_functions.py.
# ---------------------------------------------------------------------------

HARD_NEG_K = 5
X27_NPROBE = 8  # floor of the derived default; see block comment


def x27_default_nprobe(nlist: int | None) -> int:
    """nprobe = max(8, nlist // 4) — derived from the measured 10×
    recall curves above; lands 0.75–0.90 recall at every measured
    nlist, never exceeds nlist."""
    n = nlist if nlist is not None else IVF_NLIST
    return min(n, max(X27_NPROBE, n // 4))


def _probe_cells(emb: DataFrame, centers, nprobe: int) -> DataFrame:
    """Append an array of the nprobe nearest cell ids per vector (one
    Arrow matmul per batch; stable argsort so ties resolve to the
    lowest cell index on every run)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)
    c_sq = (C**2).sum(axis=1)

    @pandas_udf("array<int>")
    def _cells(col: pd.Series) -> pd.Series:
        M = np.array(col.tolist(), dtype=np.float64)
        d = c_sq[None, :] - 2.0 * (M @ C.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    return emb.withColumn("probe_cells", _cells("embedding"))


def _cell_local_topk(k: int):
    """Per-cell scoring kernel for hard-negative mining: one BLAS
    matmul per (cell, anchor-block) scores every anchor probing the
    cell against every member primary-assigned to it, masks self and
    same-label entries, and emits only each anchor's cell-local top-k
    by (cos desc, cid asc) — the same order the global window uses, so
    the union of cell-local top-ks provably contains the global top-k.

    This replaces the old pair-materializing join (anchors × members
    exploded to one row PER PAIR, each carrying two dim-length arrays
    through the shuffle): the cogroup shuffles anchors nprobe× and the
    corpus once — at 10× bench scale that is ~180 k array rows instead
    of ~25 M, and the dot products move from a per-pair einsum to
    cell-sized matmuls. Anchor blocks bound the score matrix to ~32 MB
    so a skewed cell cannot blow executor memory."""
    import numpy as np

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "qid": pd.Series([], dtype="int64"),
                "cid": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
                "pos": pd.Series([], dtype="int32"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        M = np.array(right["embedding"].tolist(), dtype=np.float64)
        m_nrm = right["nrm"].to_numpy(dtype=np.float64)
        m_ids = right["vec_id"].to_numpy(dtype=np.int64)
        m_lab = right["label"].to_numpy()
        A_all = np.array(left["q_emb"].tolist(), dtype=np.float64)
        a_nrm = left["q_nrm"].to_numpy(dtype=np.float64)
        a_ids = left["qid"].to_numpy(dtype=np.int64)
        a_lab = left["q_label"].to_numpy()
        # pos = this cell's rank in the anchor's probe order; rides
        # through so one scoring pass serves every nprobe tier (an
        # anchor's nprobe=t candidates are exactly the rows with pos<t)
        a_pos = left["pos"].to_numpy(dtype=np.int32)
        m = len(m_ids)
        kk = min(k, m)
        out_q, out_c, out_s, out_p = [], [], [], []
        block = max(1, (1 << 22) // m)  # ~32 MB of float64 scores
        for s in range(0, len(a_ids), block):
            e = min(s + block, len(a_ids))
            S = (A_all[s:e] @ M.T) / (a_nrm[s:e, None] * m_nrm[None, :])
            S[a_lab[s:e, None] == m_lab[None, :]] = -np.inf
            S[a_ids[s:e, None] == m_ids[None, :]] = -np.inf
            for i in range(e - s):
                row = S[i]
                kth = np.partition(row, m - kk)[m - kk]
                if not np.isfinite(kth):
                    cand = np.where(np.isfinite(row))[0]
                    if len(cand) == 0:
                        continue
                else:
                    cand = np.where(row >= kth)[0]  # > kk only on exact ties
                cand = cand[np.lexsort((m_ids[cand], -row[cand]))][:kk]
                out_q.append(np.full(len(cand), a_ids[s + i], dtype=np.int64))
                out_c.append(m_ids[cand])
                out_s.append(row[cand])
                out_p.append(np.full(len(cand), a_pos[s + i], dtype=np.int32))
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "cid": np.concatenate(out_c),
                "cos": np.concatenate(out_s),
                "pos": np.concatenate(out_p),
            }
        )

    return fn


def hard_negatives_sweep(
    emb: DataFrame,
    nprobes,
    k: int = HARD_NEG_K,
    nlist: int = None,
    index=None,
) -> dict:
    """{nprobe: (qid, cid, rank, cos)} for every requested nprobe from
    ONE probe + ONE scoring pass (VERDICT r13 #4).

    The stable-argsort probe order means an anchor's nprobe=t cells are
    exactly the FIRST t entries of its nprobe=max(t) list, so the sweep
    probes once at the widest tier, carries each cell's probe rank
    (``pos``) through the scoring kernel, and derives every narrower
    tier as a ``pos < t`` filter over the shared (tiny, anchors ×
    nprobe × k) scored rows — bit-identical to running each tier
    standalone, without re-paying the corpus-sized Arrow passes per
    grid point (guide §4: the per-job Python handshake is the floor
    cost here). Multi-tier sweeps persist the scored rows so later
    tiers re-rank without re-scoring.

    ``index`` optionally passes a prebuilt ``(assigned, centers)`` pair
    from ``ivf_assignments`` so callers sweeping at a fixed quantizer
    (the bench curves) don't re-fit and re-assign the corpus — the
    production shape too, where the index is a written table and
    probes are the only per-query work."""
    from pyspark.sql import Window

    tiers = sorted({int(t) for t in nprobes})
    nmax = tiers[-1]
    if index is not None:
        assigned, centers = index
    else:
        assigned, centers = ivf_assignments(with_norm(emb), nlist=nlist)
    # assign_cells projects to (vec_id, embedding, nrm, cell) — labels
    # rejoin on the id key (a broadcast-or-shuffle hash join on the
    # corpus key either way; at scale the label column would simply be
    # carried in the index table).
    idx = track_persist(assigned.join(emb.select("vec_id", "label"), "vec_id"))
    a = _probe_cells(idx, centers, nmax).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("q_label"),
        F.posexplode("probe_cells").alias("pos", "cell"),
    )
    # cell-local scoring: cogroup anchors-probing-a-cell with the
    # cell's members and run the matmul kernel per cell; only the tiny
    # (qid, cid, cos, pos) top-k survivors leave the kernel, so the
    # global re-rank window sees anchors × nprobe × k rows, never pair
    # rows.
    scored = (
        a.groupBy("cell")
        .cogroup(
            idx.select("cell", "vec_id", "embedding", "nrm", "label").groupBy("cell")
        )
        .applyInPandas(_cell_local_topk(k), "qid long, cid long, cos double, pos int")
    )
    if len(tiers) > 1:
        scored = track_persist(scored)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    out = {}
    for t in tiers:
        tier_rows = scored.where(F.col("pos") < t) if t < nmax else scored
        out[t] = (
            tier_rows.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "cid", "rank", round2("cos").alias("cos"))
            .orderBy("qid", "rank")
        )
    return out


def hard_negatives(
    emb: DataFrame,
    k: int = HARD_NEG_K,
    nprobe: int = None,
    nlist: int = None,
    index=None,
) -> DataFrame:
    """(qid, cid, rank, cos) — per anchor, the k most-cosine-similar
    DIFFERENT-label vectors among the candidates in the anchor's
    X27_NPROBE nearest cells (the FAISS probe semantics, applied
    anchor-side: each anchor explodes to its probe cells, candidates
    stay primary-assigned, so a pair can form through at most one
    cell and no dedup pass is needed). Single-tier form of
    ``hard_negatives_sweep``."""
    if nprobe is None:
        nprobe = x27_default_nprobe(nlist)
    return hard_negatives_sweep(emb, [nprobe], k=k, nlist=nlist, index=index)[nprobe]


@query("x27_hard_negative_mining")
def x27_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hard_negatives(load(spark, sf_dir, "embeddings"))
