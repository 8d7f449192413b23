"""Pipelines: end-to-end jobs composed from stages."""
