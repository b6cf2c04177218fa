"""Declared queries, model runner, incremental plans."""
