"""Structured Streaming surfaces: incremental sketch builds + windowed aggs."""
