"""Schema-generic operators: relational building blocks + the
large-scale training-data-pipeline extensions (dedup, similarity,
text analysis, multimodal plumbing)."""
