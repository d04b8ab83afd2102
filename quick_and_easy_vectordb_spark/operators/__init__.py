"""Operators: search (top-k / kNN), dedup family, text analysis,
ANN index build, multimodal plumbing."""
