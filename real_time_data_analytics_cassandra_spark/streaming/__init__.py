"""Structured Streaming pipelines mirroring the reference write path."""
