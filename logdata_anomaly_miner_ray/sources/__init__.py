"""Sources: pruned Parquet readers and the deterministic synthetic
web-pages fixture generator (FIXTURES.md F1/F2)."""
