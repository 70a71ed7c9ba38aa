"""Corpus module: relational (populated incrementally)."""
