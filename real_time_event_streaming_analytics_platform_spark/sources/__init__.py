"""Input sources: deterministic streaming fixtures (fixtures.py). The
parquet batch loaders live in ..catalog; the file/Kafka stream readers in
..streaming.entries."""
