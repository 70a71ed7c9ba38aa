"""Corpus module: llm (populated incrementally)."""
