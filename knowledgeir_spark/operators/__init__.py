"""Relational operators of the engine (DataFrame-level building blocks)."""
