"""Incremental / resumable execution (checkpoint lineage) and optional
Structured Streaming entry points."""
