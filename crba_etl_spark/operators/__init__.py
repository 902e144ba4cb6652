"""Operator library: CDC reducers/merge plus training-data-pipeline ops
(dedup, similarity search, text analysis)."""
