"""Distributed operators: Drain template mining, dedup, similarity search,
anomaly scoring, descriptive stats."""
