"""Structured Streaming extensions (beyond the reference surface —
SQLite/steampipe has no streaming; SURVEY.md §2.3 'Streaming' row)."""
