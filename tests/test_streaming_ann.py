"""S16 — streaming ANN admit: new embeddings stream into a standing
IVF index (the streaming twin of x3f, as s12 is of x2f).

The index is a parquet table of cell assignments; each micro-batch of
new vectors is assigned to its nearest EXISTING coarse cell
(`assign_cells` — one Arrow matmul over the batch, quantizer untouched)
and appended. A probe over the re-read table must find a planted batch
vector at rank 1 — proving streamed vectors land in searchable cells
and the index table is the only state shared between build, ingest and
search.
"""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.functions.similarity import (
    assign_cells,
    ivf_assignments,
    ivf_probe,
    with_norm,
)

SCHEMA = "vec_id long, embedding array<double>"


def test_s16_streaming_ann_admit(spark, tmp_path):
    rng = np.random.RandomState(7)
    standing_rows = [(int(i), [float(x) for x in rng.randn(8)]) for i in range(300)]
    standing = with_norm(spark.createDataFrame(standing_rows, SCHEMA))
    assigned, centers = ivf_assignments(standing)

    index_dir = str(tmp_path / "index")
    assigned.write.mode("overwrite").parquet(index_dir)

    # two micro-batches of "new" vectors; 1000 is a copy of query 0
    src = tmp_path / "in"
    src.mkdir()
    batches = [
        [(1000, list(standing_rows[0][1]))],
        [(int(2000 + i), [float(x) for x in rng.randn(8)]) for i in range(10)],
    ]
    for bi, rows in enumerate(batches):
        with open(src / f"b{bi}.json", "w") as fh:
            for vid, emb in rows:
                fh.write(json.dumps({"vec_id": vid, "embedding": emb}) + "\n")

    def admit(batch_df, batch_id):
        admitted = assign_cells(with_norm(batch_df), centers)
        admitted.write.mode("append").parquet(index_dir)

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    merged = spark.read.parquet(index_dir)
    assert merged.count() == 300 + 11
    got = ivf_probe(spark, merged, centers).collect()
    top0 = [r for r in got if r["qid"] == 0 and r["rank"] == 1]
    assert top0 and top0[0]["cid"] == 1000, top0
    assert abs(top0[0]["cos"] - 1.0) < 1e-6
