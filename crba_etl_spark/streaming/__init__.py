"""Structured Streaming surface: change-tail source + foreachBatch apply."""
