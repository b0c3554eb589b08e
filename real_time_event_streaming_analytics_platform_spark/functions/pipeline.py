"""Training-data pipeline composition operators: near-dup group
resolution, deterministic dataset splits, and sequence packing — the
steps that sit between the per-document ops (dedup/text/similarity) and
an actual LLM training corpus.

- x2e: connected components over the MinHash-LSH near-dup candidate
  graph → dedup GROUPS (keeper + members), not just pairs. Iterative
  min-label propagation, one join + one aggregate per round; dup groups
  are near-cliques so the label frontier converges in O(diameter) ≈ 2-3
  rounds. At 100 TB scale the same loop runs with the edge list salted
  on the hot component ids (or swap in large-star/small-star /
  GraphFrames); iteration count is logged, never unbounded.
- x5: deterministic train/val/test split by md5(doc_id) hex prefix —
  reproducible across engines and runs, no RNG state, and stable under
  corpus growth (a doc's split never depends on other docs).
- x6: sequence packing — concatenate-then-chunk token budgeting per
  source shard via a windowed cumulative sum; the bin id is the
  2048-token context window a doc's first token lands in. Partitioned
  by source, so the window never funnels the corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.registry import query
from .dedup import minhash_candidates

# ---------------------------------------------------------------------------
# X2e — near-dup groups via connected components on candidate pairs.
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 15
) -> DataFrame:
    """(node, comp) labels: comp = min node id of the connected component.

    Min-label propagation: each round every node takes the smallest
    label among itself and its neighbors. Converges in diameter rounds;
    ``max_iter`` bounds the worst case (a path graph). Each round is one
    shuffle on the edge endpoints plus a small label join — no driver
    data, only the per-round convergence count comes back.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    prev = None
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("comp").alias("nbr_comp")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
            .select(F.col("a").alias("node"), "nbr_comp")
        )
        new_labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.join(
                labels.select("node", F.col("comp").alias("old_comp")), "node"
            )
            .where(F.col("comp") != F.col("old_comp"))
            .count()
        )
        if prev is not None:
            prev.unpersist()
        prev, labels = new_labels, new_labels
        if changed == 0:
            break
    out = labels.select("node", "comp")
    sym.unpersist()
    return out


@query("x2e_dedup_groups")
def x2e_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups on documents: MinHash-LSH candidate pairs with
    estimated Jaccard ≥ 0.5 are the edges; connected components resolve
    transitive chains (A≈B, B≈C ⇒ one group even if A,C never collide).
    Output one row per multi-doc group: keeper (min doc_id), group size,
    and the sorted member list. Rows-only (xxhash64 has no DuckDB twin);
    planted-chain recall asserted in tests/test_functions.py."""
    docs = load(spark, sf_dir, "documents")
    edges = minhash_candidates(docs).where(F.col("est_jaccard") >= 0.5)
    labels = connected_components(edges, "doc_a", "doc_b")
    return (
        labels.groupBy("comp")
        .agg(
            F.count("*").alias("group_size"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
        .select(F.col("comp").alias("keeper"), "group_size", "members")
        .orderBy("keeper")
    )


# ---------------------------------------------------------------------------
# X5 — deterministic train/val/test split by content-free hash of the
# document id. The hex-prefix comparison gives a ~80/10/10 split
# ('00'..'cb' = 204/256, 'cc'..'e5' = 26/256, rest = 26/256) that is
# identical in any engine with a standard md5 — no RNG, no seed to ship,
# and adding documents never moves an existing one between splits.
# ---------------------------------------------------------------------------


@query(
    "x5_train_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM (
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ) GROUP BY split ORDER BY split
    """,
)
def x5_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    prefix = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    split = (
        F.when(prefix < "cc", "train").when(prefix < "e6", "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# X6 — sequence packing: concatenate-then-chunk token budgeting. A doc's
# bin is the context window its FIRST token lands in under in-order
# concatenation per source shard — the standard pretraining packing
# layout. Window is partitioned by source: the cumulative sum shuffles
# once on source and never serializes the whole corpus through one task.
# ---------------------------------------------------------------------------

PACK_TOKENS = 2048

_WS_TOK_SPARK = "size(filter(split(text, '\\\\s+'), w -> w != ''))"
_WS_TOK_DUCK = "len(list_filter(string_split_regex(text, '\\s+'), w -> w != ''))"


@query(
    "x6_sequence_pack",
    oracle=f"""
    SELECT source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM (
        SELECT source, doc_id, tokens,
               CAST(FLOOR((SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - tokens) * 1.0 / {PACK_TOKENS}) AS BIGINT) AS bin
        FROM (SELECT source, doc_id, {_WS_TOK_DUCK} AS tokens FROM documents)
    ) GROUP BY source, bin ORDER BY source, bin
    """,
)
def x6_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", "doc_id", F.expr(_WS_TOK_SPARK).alias("tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.withColumn(
        "bin",
        F.floor((F.sum("tokens").over(w) - F.col("tokens")) * 1.0 / PACK_TOKENS).cast(
            "bigint"
        ),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# X7 — int8 embedding quantization: per-vector symmetric scale to
# [-127, 127] — the storage/serving format a 100 TB embedding corpus uses
# (4x smaller than float32, 8x than float64). All elementwise JVM
# expressions; floor(x + 0.5) is round-half-up in every engine (native
# ROUND ties differ across engines). The output summarizes the quantized
# vector (min/max/sum/nonzeros) so verification never ships arrays.
# ---------------------------------------------------------------------------

_ABSMAX_SPARK = (
    "aggregate(embedding, 0D, (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
)
_ABSMAX_DUCK = (
    "list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),"
    " (a, b) -> greatest(a, b))"
)


def _quant(absmax: str) -> str:
    # identical elementwise expression in both dialects
    return (
        f"CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / {absmax} + 0.5) AS BIGINT)"
    )


@query(
    "x7_embedding_quantize",
    oracle=f"""
    SELECT vec_id,
           CAST(list_reduce(q, (a, b) -> least(a, b)) AS BIGINT) AS q_min,
           CAST(list_reduce(q, (a, b) -> greatest(a, b)) AS BIGINT) AS q_max,
           CAST(list_reduce(q, (a, b) -> a + b) AS BIGINT) AS q_sum,
           CAST(len(list_filter(q, v -> v != 0)) AS BIGINT) AS q_nonzero
    FROM (
        SELECT vec_id,
               list_transform(embedding, x -> {_quant(f'({_ABSMAX_DUCK})')}) AS q
        FROM embeddings
        WHERE {_ABSMAX_DUCK} > 0
    ) ORDER BY vec_id
    """,
)
def x7_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = F.expr(
        f"transform(embedding, x -> {_quant(f'({_ABSMAX_SPARK})')})"
    ).alias("q")
    return (
        emb.where(F.expr(_ABSMAX_SPARK) > 0)
        .select("vec_id", q)
        .select(
            "vec_id",
            F.array_min("q").cast("bigint").alias("q_min"),
            F.array_max("q").cast("bigint").alias("q_max"),
            F.expr("aggregate(q, 0L, (acc, v) -> acc + v)").alias("q_sum"),
            F.expr("size(filter(q, v -> v != 0))").cast("bigint").alias("q_nonzero"),
        )
        .orderBy("vec_id")
    )
