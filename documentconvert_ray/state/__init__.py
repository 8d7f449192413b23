"""State: per-partition lineage manifests and resume logic (no serving DB)."""
