"""End-to-end pipeline composition + checkpoint/resume."""
