"""Model-based language identification (t1b): one-vs-rest logistic
regression over hashed character-n-gram features — the fastText-style
langid family (Joulin et al. 2016, arXiv:1607.01759 — public; CLD/
langid.py use the same char-n-gram feature space) re-expressed on the
x26 IRLS machinery, giving t1's stopword heuristic a TRAINED twin
(VERDICT r09 #5: t1 was the last heuristic-only curation stage without
a model counterpart).

Reference analog: extends the t1 text-analysis family (SURVEY.md
LLM-pipeline section); the reference itself has no language surface.

Spark-first shape:
- **features**: character 3-grams of the lowercased text hashed into
  the shared LR_BUCKETS space, built with the same two codegen'd hash
  aggregations as x26's word-gram features (one corpus scan, one
  (doc_id, bucket) shuffle of few-hundred-byte rows, one per-doc
  collect_list). A shuffle-free per-row twin (``char_row_features``)
  exists for the streaming scorer and is value- and order-identical
  (S31 bitwise parity) — kept off the batch path per the measured x26
  A/B (interpreted lambdas lose to codegen'd aggregation).
- **fit**: a MULTICLASS one-vs-rest IRLS where each iteration is ONE
  fused mapInPandas job carrying all K classes' (gradient, Hessian)
  partials (Z = X·Wᵀ is a single gemm; the K per-class Hessians share
  X) — the corpus is scanned once (the feature build) and the feature
  table LR_ITERS times TOTAL, independent of K. Partial size is
  K·B²-bounded and corpus-size-free; the K ridge-damped systems solve
  on the driver. K = observed languages (a bounded distinct,
  collected). Measured vs K sequential binary fits: 25 scheduler-bound
  jobs (~32 s at sf0.1) collapse to 1 + LR_ITERS jobs.
- **score**: ONE Arrow pass computes all K logits per document from
  the shared sparse (bs, xs) arrays; argmax with ties resolved to the
  lexicographically first language (langs sorted, np.argmax takes the
  first maximum); featureless docs take the bias argmax.

Rows-only registration (the iterative fit is not one-statement SQL);
planted-label recovery, determinism, numpy replay parity, measured
agreement with t1, and the S31 frozen-model streaming parity are
pinned in tests/test_classifier.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._shingle import _parallelize
from ..catalog import load
from ..operators.helpers import round2
from ..plans.registry import query, track_persist
from .classifier import LR_BUCKETS, LR_ITERS, LR_RIDGE, LR_TOL
from .text import heuristic_lang_pred

CHAR_N = 3  # fastText langid's default char-n-gram floor

# bucket expression over one gram string g — xxhash64 is fine here
# (rows-only operator; no DuckDB twin needs to reproduce the hash)
_CHAR_BUCKET = f"pmod(xxhash64(g), {LR_BUCKETS})"
_GRAMS = (
    f"transform(sequence(1, length(_txt) - {CHAR_N - 1}),"
    f" i -> substring(_txt, i, {CHAR_N}))"
)


def _bound_text(docs: DataFrame) -> DataFrame:
    """(doc_id, _txt): lowercased trimmed text with at least one full
    character n-gram. The length guard matters: sequence(1, n) DESCENDS
    for n < 1 in Spark, so short docs must be excluded before the gram
    transform, never after."""
    return (
        _parallelize(docs)
        .select("doc_id", F.lower(F.trim(F.col("text"))).alias("_txt"))
        .where(F.length("_txt") >= CHAR_N)
    )


def char_gram_features(docs: DataFrame) -> DataFrame:
    """(doc_id, bs, xs): per-doc sparse L1-normalized hashed char-3-gram
    features — the aggregated batch build (two codegen'd hash
    aggregations), mirroring classifier.hashed_features."""
    dbc = (
        _bound_text(docs)
        .select(
            "doc_id",
            F.explode(F.expr(f"transform(({_GRAMS}), g -> {_CHAR_BUCKET})")).alias(
                "b"
            ),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        dbc.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("b", "cnt"))).alias("f"))
        .withColumn("tot", F.expr("aggregate(f, 0L, (a, s) -> a + s.cnt)"))
        .select(
            "doc_id",
            F.expr("transform(f, s -> s.b)").alias("bs"),
            F.expr("transform(f, s -> CAST(s.cnt AS DOUBLE) / tot)").alias("xs"),
        )
    )


def char_row_features(docs: DataFrame) -> DataFrame:
    """The shuffle-free twin of ``char_gram_features`` — scan-local
    array algebra, legal inside Structured Streaming. Value- and
    order-identical output (S31 bitwise parity); batch callers use the
    aggregated form (the measured x26 A/B)."""
    return (
        _bound_text(docs)
        .withColumn("_ba", F.expr(f"transform(({_GRAMS}), g -> {_CHAR_BUCKET})"))
        .withColumn("_bs", F.expr("array_sort(array_distinct(_ba))"))
        .select(
            "doc_id",
            F.col("_bs").alias("bs"),
            F.expr(
                "transform(_bs, b -> CAST(size(filter(_ba, x -> x = b)) AS DOUBLE)"
                " / size(_ba))"
            ).alias("xs"),
        )
    )


def fit_langid(
    feats_labeled: DataFrame,
    langs: list[str],
    buckets: int = LR_BUCKETS,
    iters: int = LR_ITERS,
    ridge: float = LR_RIDGE,
    tol: float = LR_TOL,
):
    """K×(B+1) one-vs-rest weight matrix, fit with a MULTICLASS IRLS:
    each iteration is still ONE fused mapInPandas job (the x26
    discipline), but the partition partial now carries all K classes'
    (gradient, Hessian) statistics — Z = X·Wᵀ is one gemm, the K
    per-class Hessians share the same X — so the feature table is
    scanned iters times TOTAL, not iters×K times. Measured: the
    K-separate-fits form spent ~25 scheduler-bound jobs (~32 s at
    sf0.1); this form spends 1 + iters. The K independent ridge-damped
    (B+1)×(B+1) systems solve on the driver, exactly as K sequential
    fit_quality_lr calls would — the binary-fit replay-parity argument
    carries over class-by-class."""
    import numpy as np

    dim = buckets + 1
    K = len(langs)
    W = np.zeros((K, dim))
    if K == 0:
        return W
    n = feats_labeled.count()
    if n == 0:
        return W
    spark = feats_labeled.sparkSession
    parts = max(4, min(512, -(-n // 20_000)))
    base = track_persist(
        feats_labeled.select("lang", "bs", "xs").repartition(parts)
    )
    # Fit in the COMPACT space of occupied buckets (a bounded ≤ B-row
    # distinct): an unoccupied bucket's gradient and Hessian row are
    # identically zero, so its ridge-damped Newton update is exactly 0
    # and dropping it changes nothing — while the per-partition gemms
    # shrink from (B+1)² to (occupied+1)² flops (measured ~10× at
    # sf0.1, where 323 of 1024 buckets are occupied).
    occ = np.array(
        sorted(
            r["b"]
            for r in feats_labeled.select(F.explode("bs").alias("b"))
            .distinct()
            .collect()
        ),
        dtype=np.int64,
    )
    dim_c = len(occ) + 1
    Wc = np.zeros((K, dim_c))
    lang_idx = {lg: k for k, lg in enumerate(langs)}
    block = dim_c * dim_c + dim_c  # per-class flat index space: H then G
    for _ in range(iters):
        Wb = Wc.copy()

        def _partials(batches):
            Hs = np.zeros((K, dim_c, dim_c))
            Gs = np.zeros((K, dim_c))
            seen = False
            for pdf in batches:
                if pdf.empty:
                    continue
                seen = True
                lens = np.fromiter(
                    (len(v) for v in pdf["bs"]), dtype=np.int64, count=len(pdf)
                )
                bcat = np.concatenate(list(pdf["bs"])).astype(np.int64)
                xcat = np.concatenate(list(pdf["xs"])).astype(np.float64)
                X = np.zeros((len(lens), dim_c))
                X[
                    np.repeat(np.arange(len(lens)), lens),
                    np.searchsorted(occ, bcat),
                ] = xcat
                X[:, -1] = 1.0
                ycls = (
                    pdf["lang"].map(lang_idx).to_numpy(dtype=np.int64)
                )
                Z = X @ Wb.T  # rows × K, one gemm for all classes
                P = 1.0 / (1.0 + np.exp(-Z))
                R = P - (ycls[:, None] == np.arange(K)[None, :])
                Gs += (X.T @ R).T
                WD = np.maximum(P * (1.0 - P), 1e-6)
                for k in range(K):
                    Hs[k] += (X * WD[:, k : k + 1]).T @ X
            if seen:
                pos_chunks, val_chunks = [], []
                for k in range(K):
                    # H is symmetric: ship the upper triangle only —
                    # halves both the merge shuffle and the driver pull
                    hi, hj = np.nonzero(np.triu(Hs[k]))
                    gi = np.nonzero(Gs[k])[0]
                    pos_chunks.append(
                        k * block + hi.astype(np.int64) * dim_c + hj
                    )
                    pos_chunks.append(k * block + dim_c * dim_c + gi)
                    val_chunks.append(Hs[k][hi, hj])
                    val_chunks.append(Gs[k][gi])
                yield pd.DataFrame(
                    {
                        "pos": np.concatenate(pos_chunks),
                        "v": np.concatenate(val_chunks),
                    }
                )

        # K·occupied² merged cells is ~500k rows at five classes —
        # row-object collect() spends seconds materializing them, so
        # pull the merged partial as ONE Arrow batch and reassemble
        # vectorized (the conf is runtime-settable; the driver's plain
        # session doesn't enable it by default).
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        mpdf = (
            base.mapInPandas(_partials, "pos long, v double")
            .groupBy("pos")
            .agg(F.sum("v").alias("v"))
            .toPandas()
        )
        pos = mpdf["pos"].to_numpy(dtype=np.int64)
        val = mpdf["v"].to_numpy(dtype=np.float64)
        ks, off = np.divmod(pos, block)
        hm = off < dim_c * dim_c
        H = np.zeros((K, dim_c, dim_c))
        G = np.zeros((K, dim_c))
        H[ks[hm], off[hm] // dim_c, off[hm] % dim_c] = val[hm]
        upper = np.triu(H, 1)
        H += upper.transpose(0, 2, 1)  # mirror the shipped triangle
        G[ks[~hm], off[~hm] - dim_c * dim_c] = val[~hm]
        deltas = np.stack(
            [
                np.linalg.solve(H[k] + ridge * np.eye(dim_c), G[k])
                for k in range(K)
            ]
        )
        Wc = Wc - deltas
        if float(np.abs(deltas).max()) < tol:
            break
    W[:, occ] = Wc[:, :-1]
    W[:, -1] = Wc[:, -1]
    return W


def score_langid(feats: DataFrame, W, langs: list[str]) -> DataFrame:
    """(doc_id, lang_model, prob_model): all K logits in one Arrow pass
    over the shared sparse arrays; argmax ties go to the
    lexicographically first language (langs is sorted; np.argmax takes
    the first maximum); prob_model = sigmoid of the winning logit."""
    import numpy as np

    Wm = np.asarray(W, dtype=np.float64)
    names = list(langs)

    def _score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            lens = np.fromiter(
                (len(v) for v in pdf["bs"]), dtype=np.int64, count=len(pdf)
            )
            bcat = np.concatenate(list(pdf["bs"])).astype(np.int64)
            xcat = np.concatenate(list(pdf["xs"])).astype(np.float64)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            Z = np.stack(
                [
                    np.add.reduceat(Wm[k][bcat] * xcat, starts) + Wm[k, -1]
                    for k in range(len(names))
                ],
                axis=1,
            )
            best = np.argmax(Z, axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang_model": [names[i] for i in best],
                    "prob_model": 1.0
                    / (1.0 + np.exp(-Z[np.arange(len(best)), best])),
                }
            )

    return feats.select("doc_id", "bs", "xs").mapInPandas(
        _score, "doc_id long, lang_model string, prob_model double"
    )


def langid_model(docs: DataFrame):
    """Train the OvR langid model on ``docs``' own lang labels; returns
    (feats, W, langs) — feats persisted for the caller's scoring pass."""
    feats = track_persist(
        char_gram_features(docs).join(docs.select("doc_id", "lang"), "doc_id")
    )
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    return feats, fit_langid(feats, langs), langs


def langid_predictions(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, lang_model, prob_model) for EVERY document —
    featureless docs (fewer than CHAR_N characters) take the bias
    argmax, the trained majority-class prior."""
    import math

    import numpy as np

    feats, W, langs = langid_model(docs)
    bias_k = int(np.argmax(W[:, -1]))
    bias_prob = 1.0 / (1.0 + math.exp(-float(W[bias_k, -1])))
    return (
        docs.select("doc_id", "lang")
        .join(score_langid(feats, W, langs), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lang_model", F.lit(langs[bias_k])).alias("lang_model"),
            round2(F.coalesce("prob_model", F.lit(bias_prob))).alias(
                "prob_model"
            ),
        )
    )


def langid_stream(stream_docs: DataFrame, W, langs: list[str]) -> DataFrame:
    """S31: score an unbounded documents stream with a FROZEN langid
    model — the train-offline / score-online split (S29's discipline).
    Streaming-legal by construction: the shuffle-free per-row feature
    build and the Arrow scoring pass are stateless projections. Bitwise
    parity with the batch scorer is pinned in tests/test_classifier.py."""
    return score_langid(char_row_features(stream_docs), W, langs)


@query("t1b_lang_id_model")
def t1b_lang_id_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained langid over the corpus with the t1 heuristic's verdict
    alongside: (doc_id, lang, lang_model, prob_model, lang_t1,
    agree_t1) — agree_t1 makes the model-vs-heuristic agreement rate a
    one-aggregate measurement (avg(agree_t1)), per VERDICT r09 #5.
    Rows-only: iterative OvR IRLS fit."""
    docs = load(spark, sf_dir, "documents")
    return (
        langid_predictions(docs)
        .join(heuristic_lang_pred(docs), "doc_id")
        .select(
            "doc_id",
            "lang",
            "lang_model",
            "prob_model",
            "lang_t1",
            (F.col("lang_model") == F.col("lang_t1")).cast("int").alias(
                "agree_t1"
            ),
        )
        .orderBy("doc_id")
    )
