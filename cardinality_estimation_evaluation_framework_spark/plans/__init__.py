"""Execution plans: checkpointed/resumable sketch builds with lineage."""
