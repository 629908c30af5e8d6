"""Structured-Streaming entry points: incremental indexing + windowed aggs.

The reference has no streaming (SURVEY.md §2.10); these are the engine's
additions for continuously-arriving web crawls.
"""
