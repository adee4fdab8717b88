"""Structured Streaming operators and lineage listener."""
