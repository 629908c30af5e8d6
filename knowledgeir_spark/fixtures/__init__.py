"""Deterministic synthetic fixtures (FIXTURES.md): webpages + queries + qrels."""
