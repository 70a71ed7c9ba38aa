"""Corpus module: streaming_batch (populated incrementally)."""
