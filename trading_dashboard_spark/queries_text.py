"""Text-tier queries (filled in next)."""
