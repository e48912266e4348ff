"""Spark operators: extraction, dedup, similarity, text stats, media."""
