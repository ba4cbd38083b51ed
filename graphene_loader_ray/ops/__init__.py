"""General-purpose Ray Data operators (reusable outside the KG pipeline)."""
