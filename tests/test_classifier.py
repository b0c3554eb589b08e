"""x26 model-based quality classifier (functions/classifier.py):
planted-label recovery, run-to-run determinism, pure-numpy IRLS replay
parity, and the optional model stage in the x10 curation funnel."""

import numpy as np
from pyspark.sql import functions as F

import real_time_event_streaming_analytics_platform_spark as engine
from real_time_event_streaming_analytics_platform_spark.catalog import load
from real_time_event_streaming_analytics_platform_spark.functions.classifier import (
    LR_ITERS,
    LR_RIDGE,
    fit_quality_lr,
    hashed_features,
    quality_keep,
    quality_scores,
)
from real_time_event_streaming_analytics_platform_spark.functions.pipeline import (
    curation_funnel,
)


def _two_vocab_docs(spark, n_per=20, probes=True):
    """Target docs use one vocabulary, raw docs a disjoint one; two
    held-out probes (ids 900/901) are written in each vocabulary but
    labeled OUTSIDE the target slice."""
    t_words = "alpha beta gamma delta epsilon zeta".split()
    r_words = "rock sand clay silt loam peat".split()
    rows = []
    for i in range(n_per):
        rows.append((i, "en", " ".join(t_words[(i + j) % 6] for j in range(14))))
    for i in range(n_per, 2 * n_per):
        rows.append((i, "de", " ".join(r_words[(i + j) % 6] for j in range(14))))
    if probes:
        rows.append((900, "fr", " ".join(t_words * 3)))
        rows.append((901, "fr", " ".join(r_words * 3)))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_x26_planted_label_recovery(spark):
    """A linearly separable planted corpus must fit to perfect
    training separation AND generalize: the target-vocabulary held-out
    probe outscores the raw-vocabulary probe even though both are
    labeled negative."""
    docs = _two_vocab_docs(spark)
    feats = hashed_features(docs, F.col("lang") == "en")
    w = fit_quality_lr(feats)
    probs = {
        r["doc_id"]: r["prob"] for r in quality_scores(docs, feats, w).collect()
    }
    pos = [probs[i] for i in range(20)]
    neg = [probs[i] for i in range(20, 40)]
    assert min(pos) > 0.5 > max(neg), (min(pos), max(neg))
    assert probs[900] > 0.5 > probs[901]
    assert min(pos) > max(neg)


def test_x26_query_is_deterministic(spark):
    q = engine.QUERIES["x26_quality_classifier"]
    a = [tuple(r) for r in q(spark, "/root/testdata/sf0.001").collect()]
    b = [tuple(r) for r in q(spark, "/root/testdata/sf0.001").collect()]
    assert a == b
    assert len(a) >= 2  # per-lang rows
    # n_keep is bounded by n_docs
    assert all(r[2] <= r[1] for r in a)


def test_x26_numpy_replay_parity(spark):
    """The distributed IRLS (sparse per-partition gradient+Hessian
    partials, groupBy merge, driver solve) must agree with a dense
    single-machine replay of the same schedule to float-merge
    tolerance."""
    docs = _two_vocab_docs(spark, probes=False)
    feats = hashed_features(docs, F.col("lang") == "en")
    rows = feats.collect()
    w = fit_quality_lr(feats)

    dim = len(w)
    y = np.array([r["y"] for r in rows], float)
    X = np.zeros((len(rows), dim))
    for i, r in enumerate(rows):
        X[i, np.array(r["bs"])] = np.array(r["xs"])
    X[:, -1] = 1.0
    wr = np.zeros(dim)
    for _ in range(LR_ITERS):
        z = X @ wr
        p = 1.0 / (1.0 + np.exp(-z))
        wd = np.maximum(p * (1.0 - p), 1e-6)
        H = (X * wd[:, None]).T @ X + LR_RIDGE * np.eye(dim)
        wr -= np.linalg.solve(H, X.T @ (p - y))
    p_dist = 1.0 / (1.0 + np.exp(-(X @ np.asarray(w))))
    p_rep = 1.0 / (1.0 + np.exp(-(X @ wr)))
    assert np.allclose(p_dist, p_rep, atol=1e-4), np.abs(p_dist - p_rep).max()
    assert ((p_dist >= 0.5) == (p_rep >= 0.5)).all()


def test_funnel_model_stage_composes(spark):
    """quality_keep plugs into curation_funnel: the model stage appears
    as n_model between n_quality and n_dedup, every downstream count is
    bounded by its no-model twin, and model_keep=None reproduces the
    registered x10 columns exactly."""
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    base = {r["source"]: r.asDict() for r in curation_funnel(docs).collect()}
    keep = quality_keep(docs, F.col("lang") == "en")
    modeled = {
        r["source"]: r.asDict()
        for r in curation_funnel(docs, model_keep=keep).collect()
    }
    assert "n_model" not in next(iter(base.values()))
    for src, m in modeled.items():
        b = base[src]
        assert m["n_model"] <= m["n_quality"] == b["n_quality"]
        assert m["n_dedup"] <= b["n_dedup"]
        assert m["n_kept"] <= b["n_kept"]
        assert m["kept_tokens"] <= b["kept_tokens"]


def test_s29_streaming_scorer_matches_batch(spark, tmp_path):
    """S29: a frozen-model streaming scorer over arriving documents
    must produce bitwise-identical probabilities to the batch scorer —
    same per-row feature algebra, same Arrow fold, no state."""
    import json as _json

    from real_time_event_streaming_analytics_platform_spark.functions.classifier import (
        score_docs_stream,
        score_features,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    feats = hashed_features(docs, F.col("lang") == "en")
    w = fit_quality_lr(feats)
    batch = {r["doc_id"]: r["prob"] for r in score_features(feats, w).collect()}

    # replay the same docs as an arriving JSONL stream in two files
    rows = [r.asDict() for r in docs.select("doc_id", "text", "lang").collect()]
    src = tmp_path / "in"
    src.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(src / f"part{i}.json", "w") as f:
            for r in chunk:
                f.write(_json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .json(str(src))
    )
    scored = score_docs_stream(stream, w)
    q = (
        scored.writeStream.format("memory")
        .queryName("s29_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["prob"]
        for r in spark.sql("SELECT * FROM s29_scores").collect()
    }
    assert set(got) == set(batch)
    assert all(got[k] == batch[k] for k in got)  # bitwise parity
