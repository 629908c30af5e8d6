"""Job orchestration: staged idempotent commits, lineage manifests, resume."""
