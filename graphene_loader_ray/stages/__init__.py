"""KG pipeline stages: extract → KB build → link → canonicalize → derive → materialize."""
