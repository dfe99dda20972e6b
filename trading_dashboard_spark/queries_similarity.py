"""Similarity-tier queries (filled in next)."""
