"""Sources: parquet readers and the deterministic synthetic web corpus."""
