"""Composed operators beyond the reference surface: dedup, similarity,
as-of joins, sessionization — the large-scale training-data-pipeline layer.
"""
