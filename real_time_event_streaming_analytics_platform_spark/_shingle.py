"""Shared shingling + MinHash signature builders (used by dedup and tests).

Word 3-gram shingles and 64-component MinHash signatures, all with
built-in JVM expressions (split/transform/xxhash64) — no Python UDFs in
the hot path. xxhash64 is a fixed, versioned hash, so signatures are
deterministic across runs and clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 64
BANDS = 16
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_WIDTH = 3


def shingles_df(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word 3-grams of lowercased text.

    The n-gram expansion happens JVM-side via transform over an index
    sequence; short documents (< width words) contribute their full text
    as a single shingle so they still participate.
    """
    grams = F.expr(
        f"""
        CASE WHEN size(filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')) < {SHINGLE_WIDTH}
             THEN array(lower(text))
             ELSE transform(
                 sequence(1, size(filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')) - {SHINGLE_WIDTH - 1}),
                 i -> concat_ws(' ', slice(filter(split(lower(text), '[^a-z0-9]+'), w -> w != ''), i, {SHINGLE_WIDTH})))
        END
        """
    )
    return docs.select("doc_id", F.explode(grams).alias("shingle")).distinct()


def signature_df(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>[NUM_HASHES]) MinHash signatures.

    One shuffle: explode shingles → groupBy doc_id with NUM_HASHES min
    aggregates (each a different xxhash64 seed-lane via a literal prefix).
    """
    sh = shingles_df(docs)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(NUM_HASHES)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(NUM_HASHES)]).alias("sig")
    )
