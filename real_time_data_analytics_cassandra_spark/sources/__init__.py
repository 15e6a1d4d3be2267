"""Batch and bounded-stream sources."""
