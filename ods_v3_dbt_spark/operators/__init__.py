"""Relational + LLM-pipeline operators (merge, dedup, rollup, similarity)."""
