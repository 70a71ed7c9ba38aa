"""Corpus module: functions_corpus (populated incrementally)."""
