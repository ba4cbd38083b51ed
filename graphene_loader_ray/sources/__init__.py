"""Input sources: deterministic fixture synthesis and pruned Parquet readers."""
