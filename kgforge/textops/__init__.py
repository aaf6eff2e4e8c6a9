"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal column plumbing."""
