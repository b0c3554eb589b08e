"""Model-based document quality filtering: a trained logistic-regression
classifier over hashed n-gram features — the standard LLM-curation stage
(GPT-3's LR filter, Brown et al. 2020 §A; CCNet, Wenzek et al. 2020;
FineWeb-Edu keeps the shape with a model teacher) that the heuristic
(t2) and LM-statistical (x17/x19) scores approximate. Reference analog:
extends the validity/error filter family (O10/O11,
services/read-api/main.py query predicates) from fixed predicates to a
model fit on the corpus itself.

Spark-first shape:

- **features**: x25's hashed unigram+bigram buckets (exact md5-nibble
  integer arithmetic, pipeline._bucket_sql) — built once per corpus,
  L1-normalized per document, carried SPARSE as aligned (bucket, value)
  arrays so a 1024-bucket space never materializes densely per row.
- **fit**: distributed IRLS (Newton-Raphson), where each iteration is
  ONE fused mapInPandas job (the x21 k-means discipline): every
  partition reduces its rows to the mergeable sufficient statistics of
  the Newton step — gradient Xᵀ(p−y) and Hessian Xᵀdiag(p(1−p))X —
  via concatenate + add.reduceat / add.at / outer segment kernels;
  the partial size is B²-bounded and CONSTANT in the corpus size, a
  tiny groupBy merges partials, and the driver solves the
  ridge-damped (B+1)×(B+1) system. No RNG anywhere: w starts at zero
  and data order never affects the merged statistics beyond float
  addition order.
- **score**: one Arrow-batched pass with the weight vector in the
  closure; docs with no tokens score sigmoid(bias).

Labels: a curated-target indicator (``lang='en'`` stands in for a
Wikipedia-like slice, matching x25's target). ``quality_keep`` exposes
the scored corpus as a (doc_id) keep-list that plugs into the x10
curation funnel as an optional stage (pipeline.curation_funnel).

Rows-only registration: the sigmoid iteration is not one-statement SQL;
planted-label recovery, determinism, pure-numpy replay parity, and the
funnel wiring are pinned in tests/test_classifier.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._shingle import WORDS_EXPR, _parallelize
from ..catalog import load
from ..operators.helpers import round2
from ..plans.registry import query, track_persist
from .pipeline import DSIR_BUCKETS, GRAMS_SQL_W, _bucket_spark_sql

LR_BUCKETS = DSIR_BUCKETS  # share x25's feature space
LR_ITERS = 4
LR_RIDGE = 1e-3  # Newton damping; also keeps separable fits finite
LR_TOL = 1e-6
LR_THRESHOLD = 0.5


def hashed_features(docs: DataFrame, target) -> DataFrame:
    """(doc_id, y, bs, xs): per-doc sparse L1-normalized hashed-n-gram
    features (bs = sorted bucket ids, xs = aligned values) and the 0/1
    target label. Docs with zero tokens are absent (scored at bias).

    One corpus scan → one (doc_id, bucket) aggregate shuffle → one
    per-doc collect_list; sort_array makes the sparse layout (and hence
    every float dot product downstream) order-deterministic.

    A shuffle-free per-row variant exists (``row_features``, the RLE
    form) and produces value- and order-identical output; the
    aggregated form here remains the batch plan — the word+bigram gram
    arrays are long enough that the codegen'd explode+agg still beats
    the interpreted RLE lambdas at the measured SFs (r13 re-measure:
    0.9 s vs 2.8 s warm with the one-md5 bucket on both sides), while
    for the short char-gram arrays the RLE form won and langid switched
    to it. The row form is used where a shuffle is illegal: the
    Structured-Streaming scorer."""
    dbc = (
        _dsir_style_grams(docs, target)
        .groupBy("doc_id", "_t", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        dbc.groupBy("doc_id", "_t")
        .agg(F.sort_array(F.collect_list(F.struct("b", "cnt"))).alias("f"))
        .withColumn("tot", F.expr("aggregate(f, 0L, (a, s) -> a + s.cnt)"))
        .select(
            "doc_id",
            F.col("_t").cast("int").alias("y"),
            F.expr("transform(f, s -> s.b)").alias("bs"),
            F.expr("transform(f, s -> CAST(s.cnt AS DOUBLE) / tot)").alias("xs"),
        )
    )


def _dsir_style_grams(docs: DataFrame, target) -> DataFrame:
    """(doc_id, _t, b) — one row per gram occurrence with its bucket.

    The bucket is computed AFTER the explode, in a codegen'd
    projection, not inside the transform() lambda: higher-order lambdas
    run interpreted with no subexpression elimination, so the nibble
    form of the bucket paid four md5 calls per gram there; post-explode
    it is one md5 (``_bucket_spark_sql``) in generated code."""
    bound = _parallelize(docs).select(
        "doc_id", target.alias("_t"), F.expr(WORDS_EXPR).alias("_w")
    )
    return bound.select(
        "doc_id", "_t", F.explode(F.expr(GRAMS_SQL_W)).alias("g")
    ).select("doc_id", "_t", F.expr(_bucket_spark_sql("g")).alias("b"))


def row_features(docs: DataFrame, target) -> DataFrame:
    """The shuffle-free twin of ``hashed_features`` — pure scan-local
    array algebra, legal inside Structured Streaming (stateless
    projection): sort the bucket array once and run-length-scan it
    (the langid RLE shape — O(n log n) per row, one md5 per gram).
    Value- and order-identical output (pinned by the S29 bitwise-parity
    test)."""
    bound = _parallelize(docs).select(
        "doc_id", target.alias("_t"), F.expr(WORDS_EXPR).alias("_w")
    )
    ba = F.expr(f"transform(({GRAMS_SQL_W}), g -> {_bucket_spark_sql('g')})")
    b = (
        bound.withColumn("_sa", F.array_sort(ba))
        .withColumn("_n", F.expr("size(_sa)"))
        .where(F.col("_n") > 0)
        .withColumn(
            "_st",
            F.expr(
                "filter(sequence(0, _n - 1),"
                " i -> i = 0 OR _sa[i] != _sa[i-1])"
            ),
        )
    )
    return b.select(
        "doc_id",
        F.col("_t").cast("int").alias("y"),
        F.expr("transform(_st, i -> _sa[i])").alias("bs"),
        F.expr(
            "zip_with(_st, concat(slice(_st, 2, size(_st) - 1), array(_n)),"
            " (s, e) -> CAST(e - s AS DOUBLE) / _n)"
        ).alias("xs"),
    )


def _segment_logits(wb, pdf: pd.DataFrame):
    """Vectorized sparse w·x + b over one Arrow batch: concatenate the
    batch's (bucket, value) lists and reduce per-row segments."""
    import numpy as np

    lens = np.fromiter((len(v) for v in pdf["bs"]), dtype=np.int64, count=len(pdf))
    bcat = np.concatenate(list(pdf["bs"])).astype(np.int64)
    xcat = np.concatenate(list(pdf["xs"])).astype(np.float64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    z = np.add.reduceat(wb[bcat] * xcat, starts) + wb[-1]
    return z, lens, bcat, xcat


def fit_quality_lr(
    feats: DataFrame,
    buckets: int = LR_BUCKETS,
    iters: int = LR_ITERS,
    ridge: float = LR_RIDGE,
    tol: float = LR_TOL,
):
    """Distributed IRLS (Newton-Raphson) logistic regression; returns
    the (buckets+1) weight ndarray (last entry = bias).

    Each iteration is ONE fused mapInPandas job: every partition
    reduces its rows to the mergeable sufficient statistics of the
    Newton step — the gradient Xᵀ(p−y) and the Hessian Xᵀdiag(p(1−p))X
    — emitted SPARSE (only entries touched by the partition's bucket
    co-occurrences), merged by a tiny groupBy, after which the driver
    solves the ridge-damped (B+1)×(B+1) system. First-order descent on
    L1-normalized sparse features needs hundreds of corpus passes
    (bucket gradients are ~1/avg_nnz-scaled and the bias gradient
    dwarfs them — measured: 200 Adagrad passes reach 93.8% where 6
    Newton steps reach 99.2% on the same features); Newton pays the
    B²-sized partial instead, which is CONSTANT in the corpus size.
    Scale ledger at B=1024: ≤8.4 MB of Hessian partial per map
    partition per iteration — at 100k partitions that is ≲840 GB of
    shuffle per step, <1% of a 100 TB corpus read, vs ~30× extra
    corpus SCANS for the gradient-only schedule; for much larger B,
    cap the feature space or switch the driver update to L-BFGS over
    the same gradient partials."""
    import numpy as np

    dim = buckets + 1
    # The fit iterates over the FEATURE table (one sparse row per doc),
    # which is orders of magnitude smaller than the corpus — compact it
    # to ~20k docs per partition so each iteration ships a handful of
    # B²-sized partials instead of one per corpus scan partition. n is
    # known before the repartition (the count pays one extra job on the
    # unpersisted plan; the persisted, compacted frame serves all
    # iterations and the scoring pass).
    n = feats.count()  # cached when the caller track_persist'ed feats
    w = np.zeros(dim)
    if n == 0:
        return w
    spark = feats.sparkSession
    parts = max(4, min(512, -(-n // 20_000)))
    base = track_persist(feats.select("y", "bs", "xs").repartition(parts))
    # Fit in the COMPACT space of occupied buckets (the langid fit's
    # r10 treatment, exact by the same argument: an unoccupied
    # bucket's gradient and Hessian row are identically zero, so its
    # ridge-damped Newton update is exactly 0) — the per-partition
    # gemms shrink from (B+1)² to (occupied+1)² flops and the merged
    # partial from B² to occupied² cells.
    occ = np.array(
        sorted(
            r["b"]
            for r in feats.select(F.explode("bs").alias("b")).distinct().collect()
        ),
        dtype=np.int64,
    )
    dim_c = len(occ) + 1
    wc = np.zeros(dim_c)
    hsize = dim_c * dim_c  # flat index space: [0, dim_c²) Hessian, then grad
    # Adaptive merge (the langid fit's r11 treatment): when
    # parts × (triangle + dim_c) doubles fits a small driver budget,
    # each partition ships ONE dense flat array and the driver sums
    # `parts` arrays — no per-cell (pos, v) rows, no merge shuffle.
    # Past the budget (many partitions × wide occupied space — the
    # 100 TB shape) the sparse (pos, v) + groupBy tree merge takes
    # over. Same statistics either way, different float-add order
    # (covered by the replay-parity tolerance).
    tri_i, tri_j = np.triu_indices(dim_c)
    tri = len(tri_i)
    dense = parts * (tri + dim_c) <= 30_000_000
    for _ in range(iters):
        wb = wc.copy()

        def _partials(batches):
            H = np.zeros((dim_c, dim_c))
            G = np.zeros(dim_c)
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
                bloc = np.searchsorted(occ, bcat)
                starts = np.zeros(len(lens), dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                z = np.add.reduceat(wb[bloc] * xcat, starts) + wb[-1]
                p = 1.0 / (1.0 + np.exp(-z))
                r = p - pdf["y"].to_numpy(np.float64)
                wd = np.maximum(p * (1.0 - p), 1e-6)
                G[-1] += r.sum()
                np.add.at(G, bloc, np.repeat(r, lens) * xcat)
                # Hessian kernel choice is MEASURED, not assumed
                # (ADVICE r09 asked the per-row np.ix_/np.outer loop
                # to be vectorized; three forms were then benched at
                # the real shapes). Per 10-20k-row/54-nnz batch:
                # per-row block loop 0.35-0.73 s INDEPENDENT of the
                # bucket-space width; dense design-matrix gemm 0.1-0.2s
                # at dim≈324 but O(rows·dim²) — at the 100× point
                # (500k rows, ~1005 occupied buckets, 25 single-thread
                # workers) the gemm fit measured 90 s vs ~30 s for
                # this loop; a batch-wide flattened-pair np.add.at
                # scatter measured 205 s (unbuffered scatter traffic).
                # The loop's O(rows·nnz²) arithmetic with dense
                # nnz×nnz block updates is the scale-stable form:
                # per-row Python overhead (~45 µs) is constant while
                # the alternatives grow with the occupied-space width.
                # Rows have distinct buckets by construction
                # (bs = array_distinct), so block accumulation is
                # exact.
                for i in range(len(lens)):
                    s, e = starts[i], starts[i] + lens[i]
                    b, x = bloc[s:e], xcat[s:e]
                    H[np.ix_(b, b)] += wd[i] * np.outer(x, x)
                    H[b, -1] += wd[i] * x
                    H[-1, b] += wd[i] * x
                    H[-1, -1] += wd[i]
            if seen:
                if dense:
                    yield pd.DataFrame(
                        {"v": [np.concatenate([H[tri_i, tri_j], G])]}
                    )
                else:
                    # H is symmetric: ship the upper triangle only
                    hi, hj = np.nonzero(np.triu(H))
                    gi = np.nonzero(G)[0]
                    yield pd.DataFrame(
                        {
                            "pos": np.concatenate(
                                [hi.astype(np.int64) * dim_c + hj, hsize + gi]
                            ),
                            "v": np.concatenate([H[hi, hj], G[gi]]),
                        }
                    )

        # pull the merged partial as ONE Arrow batch — occupied² cells
        # (~100k rows at a 1024-bucket space) cost seconds to collect
        # as Row objects; the Arrow conf is runtime-settable on the
        # driver's plain session, but SESSION-scoped, so save and
        # restore the caller's value around the pull (ADVICE r10)
        _ARROW = "spark.sql.execution.arrow.pyspark.enabled"
        prior_arrow = spark.conf.get(_ARROW, None)
        spark.conf.set(_ARROW, "true")
        try:
            if dense:
                vs = base.mapInPandas(_partials, "v array<double>").toPandas()[
                    "v"
                ]
            else:
                mpdf = (
                    base.mapInPandas(_partials, "pos long, v double")
                    .groupBy("pos")
                    .agg(F.sum("v").alias("v"))
                    .toPandas()
                )
        finally:
            if prior_arrow is None:
                spark.conf.unset(_ARROW)
            else:
                spark.conf.set(_ARROW, prior_arrow)
        H = np.zeros((dim_c, dim_c))
        G = np.zeros(dim_c)
        if dense:
            tot = np.zeros(tri + dim_c)
            for a in vs:
                tot += np.asarray(a, dtype=np.float64)
            H[tri_i, tri_j] = tot[:tri]
            G[:] = tot[tri:]
        else:
            pos = mpdf["pos"].to_numpy(dtype=np.int64)
            val = mpdf["v"].to_numpy(dtype=np.float64)
            hm = pos < hsize
            H[pos[hm] // dim_c, pos[hm] % dim_c] = val[hm]
            G[pos[~hm] - hsize] = val[~hm]
        H += np.triu(H, 1).T  # mirror the shipped triangle
        delta = np.linalg.solve(H + ridge * np.eye(dim_c), G)
        wc = wc - delta
        if float(np.abs(delta).max()) < tol:
            break
    w[occ] = wc[:-1]
    w[-1] = wc[-1]
    return w


def score_features(feats: DataFrame, w) -> DataFrame:
    """(doc_id, prob): sigmoid(w·x + bias) per doc with features."""
    import numpy as np

    wb = np.asarray(w, dtype=np.float64)

    def _score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            z, _, _, _ = _segment_logits(wb, pdf)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "prob": 1.0 / (1.0 + np.exp(-z))}
            )

    return feats.select("doc_id", "bs", "xs").mapInPandas(
        _score, "doc_id long, prob double"
    )


def quality_scores(docs: DataFrame, feats: DataFrame, w) -> DataFrame:
    """(doc_id, prob) for EVERY doc — featureless docs score the bias."""
    import math

    bias_p = 1.0 / (1.0 + math.exp(-float(w[-1])))
    return (
        docs.select("doc_id")
        .join(score_features(feats, w), "doc_id", "left")
        .select("doc_id", F.coalesce("prob", F.lit(bias_p)).alias("prob"))
    )


def quality_keep(
    docs: DataFrame, target, threshold: float = LR_THRESHOLD
) -> DataFrame:
    """Fit on ``docs`` with ``target`` labels, return the (doc_id)
    keep-list at ``threshold`` — the optional model-filter stage for the
    x10 curation funnel."""
    feats = track_persist(hashed_features(docs, target))
    w = fit_quality_lr(feats)
    return (
        quality_scores(docs, feats, w)
        .where(F.col("prob") >= threshold)
        .select("doc_id")
    )


@query("x26_quality_classifier")
def x26_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the quality LR on the corpus (target = lang='en'), score
    every document, and profile the separation per language: doc count,
    kept-at-0.5 count, and mean probability. The per-lang regroup makes
    train-side separation visible (en mean ≫ others) and keeps the
    output stable for determinism pins."""
    docs = load(spark, sf_dir, "documents")
    feats = track_persist(hashed_features(docs, F.col("lang") == "en"))
    w = fit_quality_lr(feats)
    scored = docs.select("doc_id", "lang").join(
        quality_scores(docs, feats, w), "doc_id"
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("prob") >= LR_THRESHOLD, 1).otherwise(0)).alias(
                "n_keep"
            ),
            round2(F.avg("prob")).alias("avg_prob"),
        )
        .orderBy("lang")
    )


# Session-scoped memo for x26's train-fold weights, shared by the
# held-out eval and the threshold-curve queries (the langid
# _TRAIN_FOLD_MODEL_MEMO pattern; VERDICT r12 #7 — the pair would
# otherwise each pay the IRLS fit). KEY CONTRACT (ADVICE r12, same as
# langid): on a hit the train frame is ignored and the memo is never
# invalidated, so the key must uniquely determine the fold CONTENT and
# the target — the registered queries key on sf_dir + fold boundary +
# target tag; ad-hoc frames (planted fixtures, custom targets) pass
# None and always fit fresh. The fit is deterministic, so memo-vs-fresh
# is value-identical (pinned in tests/test_classifier.py).
_QUALITY_FOLD_MEMO: dict[str, object] = {}

# x5's md5 train-fold boundary, shared by every held-out x26 surface
_FOLD_PREFIX_SQL = "substring(md5(cast(doc_id as string)), 1, 2)"
_FOLD_BOUNDARY = "cc"


def _quality_train_fold_model(train: DataFrame, target, memo_key: str | None):
    if memo_key is not None and memo_key in _QUALITY_FOLD_MEMO:
        return _QUALITY_FOLD_MEMO[memo_key]
    w = fit_quality_lr(track_persist(hashed_features(train, target)))
    if memo_key is not None:
        _QUALITY_FOLD_MEMO[memo_key] = w
    return w


def _heldout_split(docs: DataFrame):
    prefix = F.expr(_FOLD_PREFIX_SQL)
    return (
        docs.where(prefix < F.lit(_FOLD_BOUNDARY)),
        docs.where(prefix >= F.lit(_FOLD_BOUNDARY)),
    )


def quality_heldout_eval(
    docs: DataFrame, target=None, memo_key: str | None = None
) -> DataFrame:
    """Held-out generalization measurement for the x26 quality LR
    (VERDICT r10 #5): train ONLY on x5's deterministic md5 'train'
    fold against the weak labels (default: lang = 'en', x26's target),
    score the held-out (val + test) fold with the frozen weights, and
    report per-weak-label counts — (label, n_docs, n_pred_keep,
    n_correct, accuracy). Overall held-out accuracy is
    sum(n_correct)/sum(n_docs).

    The bar is argued in tests/test_classifier.py: on the synthetic
    testdata the weak label is independent of the text, so the
    achievable ceiling is the majority-class prior; on a planted
    separable corpus the same pipeline is perfect held-out."""
    if target is None:
        target = F.col("lang") == "en"
    train, held = _heldout_split(docs)
    w = _quality_train_fold_model(train, target, memo_key)
    scored = held.select(
        "doc_id", target.cast("long").alias("label")
    ).join(
        quality_scores(held, hashed_features(held, target), w), "doc_id"
    )
    pred = (F.col("prob") >= LR_THRESHOLD).cast("long")
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(pred).alias("n_pred_keep"),
            F.sum((pred == F.col("label")).cast("long")).alias("n_correct"),
            round2(
                F.avg((pred == F.col("label")).cast("double"))
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


@query("x26_heldout_eval")
def x26_heldout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (trained model): held-out per-class eval of x26.
    Shares the train-fold fit with x26b_threshold_curve via the
    session memo (identical model by determinism)."""
    return quality_heldout_eval(
        load(spark, sf_dir, "documents"),
        memo_key=f"{sf_dir}|<{_FOLD_BOUNDARY}|en",
    )


# Threshold grid for the operating-point curve: 0.05 steps, open ends
# (t = 0 keeps everything, t = 1 keeps nothing — neither is a usable
# operating point).
THRESHOLD_GRID_STEP = 0.05


def quality_threshold_curve(
    docs: DataFrame, target=None, memo_key: str | None = None
) -> DataFrame:
    """Held-out precision/recall curve for the x26 quality filter
    (VERDICT r12 #6) — the missing step between TRAINING a filter and
    RUNNING it at 100 TB: model_keep_list was wired with a hard-coded
    0.5; this measures, per candidate threshold t over the held fold,
    what the filter would do, so the funnel can pick an operating
    point instead of guessing.

    Output: (threshold, n_keep, tp, precision, recall, f1) — one row
    per grid threshold, keep-rule ``prob >= t``.

    100 TB shape: the corpus-sized work is ONE aggregation — each
    held-out doc's score is bucketed (floor(prob/step)) and reduced to
    ≤ 1/step+1 (bucket, n, positives) rows; the per-threshold
    cumulative counts come from a broadcast inequality-join over that
    tiny frame (threshold t keeps bucket >= t/step exactly, no float
    boundary ambiguity). No per-threshold rescan, no global sort, no
    driver-side score collection. f1 uses the identity
    2TP/(2TP+FP+FN) = 2·tp/(n_keep + P)."""
    if target is None:
        target = F.col("lang") == "en"
    spark = docs.sparkSession
    train, held = _heldout_split(docs)
    w = _quality_train_fold_model(train, target, memo_key)
    scored = held.select(
        "doc_id", target.cast("long").alias("label")
    ).join(
        quality_scores(held, hashed_features(held, target), w), "doc_id"
    )
    step = THRESHOLD_GRID_STEP
    buckets = (
        scored.select(
            F.floor(F.col("prob") / F.lit(step)).cast("int").alias("b"),
            "label",
        )
        .groupBy("b")
        .agg(F.count("*").alias("n"), F.sum("label").alias("pos"))
    )
    totals = scored.agg(
        F.sum("label").cast("long").alias("P"),
        F.count("*").alias("n_held"),
    )
    n_grid = int(round(1.0 / step)) - 1
    grid = spark.range(1, n_grid + 1).select(F.col("id").cast("int").alias("i"))
    cum = (
        grid.join(F.broadcast(buckets), buckets["b"] >= grid["i"], "left")
        .groupBy("i")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_keep"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("tp"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.round(F.col("i") * step, 2).alias("threshold"),
            "n_keep",
            "tp",
            round2(
                F.when(
                    F.col("n_keep") > 0, F.col("tp") / F.col("n_keep")
                )
            ).alias("precision"),
            round2(
                F.when(F.col("P") > 0, F.col("tp") / F.col("P"))
            ).alias("recall"),
            round2(
                F.when(
                    F.col("n_keep") + F.col("P") > 0,
                    2.0 * F.col("tp") / (F.col("n_keep") + F.col("P")),
                ).otherwise(0.0)
            ).alias("f1"),
        )
        .orderBy("threshold")
    )


def select_operating_point(
    curve: DataFrame,
    mode: str = "max_f1",
    precision_floor: float | None = None,
) -> DataFrame:
    """Pick ONE operating point off a quality_threshold_curve frame.

    - ``max_f1``: the threshold maximizing f1 (ties → lowest
      threshold, i.e. highest recall — deterministic).
    - ``precision_floor``: the lowest threshold whose measured
      precision >= the floor (max recall subject to the floor) —
      empty frame if the floor is unachievable, which callers must
      treat as "do not deploy the filter".

    Tiny-frame op (≤ 19 rows in, 1 row out) — orderBy/limit here is
    driver-trivial at any corpus scale because the curve is already
    reduced."""
    if mode == "max_f1":
        return curve.orderBy(F.col("f1").desc(), F.col("threshold").asc()).limit(1)
    if mode == "precision_floor":
        if precision_floor is None:
            raise ValueError("precision_floor mode needs a floor value")
        return (
            curve.where(F.col("precision") >= precision_floor)
            .orderBy(F.col("threshold").asc())
            .limit(1)
        )
    raise ValueError(f"unknown operating-point mode {mode!r}")


def quality_keep_auto(
    docs: DataFrame,
    target,
    mode: str = "max_f1",
    precision_floor: float | None = None,
) -> tuple[DataFrame, float]:
    """The measured-threshold funnel stage: pick the operating point
    from the HELD-OUT curve (never from training scores), then fit the
    deployment model on all of ``docs`` and return (keep_list,
    chosen_threshold) — quality_keep with the hard-coded threshold
    replaced by the measurement. The 1-row collect is the bounded
    driver transfer (a float), not data."""
    point = select_operating_point(
        quality_threshold_curve(docs, target),
        mode=mode,
        precision_floor=precision_floor,
    ).collect()
    if not point:
        raise ValueError(
            f"no threshold meets precision_floor={precision_floor}; "
            "refusing to deploy the filter blind"
        )
    t = float(point[0]["threshold"])
    return quality_keep(docs, target, threshold=t), t


@query("x26b_threshold_curve")
def x26b_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (trained model): held-out precision/recall/f1 at each
    grid threshold for the x26 quality filter. Shares the train-fold
    fit with x26_heldout_eval via the session memo; tuple-level numpy
    differential + graded-signal non-degeneracy pinned in
    tests/test_classifier.py."""
    return quality_threshold_curve(
        load(spark, sf_dir, "documents"),
        memo_key=f"{sf_dir}|<{_FOLD_BOUNDARY}|en",
    )


def score_docs_stream(stream_docs: DataFrame, w) -> DataFrame:
    """Score an unbounded documents stream with a FROZEN weight vector —
    the train-offline / score-online split every production quality
    filter runs (the model refits on a schedule; arriving docs are
    scored between refits). Streaming-legal by construction: the
    shuffle-free per-row feature build (row_features) and the
    Arrow scoring pass with w in the closure are both stateless
    projections — no watermark, no state store, any output mode.
    Parity with the batch scorer is pinned in tests/test_classifier.py
    (S29): identical per-row arithmetic ⇒ identical probabilities."""
    feats = row_features(stream_docs, F.lit(False))
    return score_features(feats, w)
