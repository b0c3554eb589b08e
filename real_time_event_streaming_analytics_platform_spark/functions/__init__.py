"""LLM-data-pipeline extension operators: dedup, text analysis,
similarity search, multimodal columns. Importing the submodules registers
their queries (see ..plans.registry)."""
