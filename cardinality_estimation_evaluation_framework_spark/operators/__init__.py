"""Distributed operators: sketch aggregation harness, set ops, dedup,
similarity search, text analysis, multimodal plumbing."""
