"""Single-process reference-semantics oracle (the correctness gold standard)."""
