"""Operator library: per-key windowed computation, text analysis, dedup,
similarity search, multimodal plumbing — the reusable pieces behind both the
CDC pipelines and the training-data-prep queries."""
