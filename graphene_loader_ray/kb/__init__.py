"""Knowledge-base (vocabulary-side) semantics shared by oracle and engine."""
