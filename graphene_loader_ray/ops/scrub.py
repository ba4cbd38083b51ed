"""PII / sensitive-token scrubbing: count and redact pattern families
(emails, IPv4 addresses, phone-like digit runs, bare numbers) per record —
the privacy-filter pass of a training-data export pipeline.

Fully vectorized AND oracle-exact by construction: the hot path is
``pyarrow.compute.count_substring_regex`` + ``replace_substring_regex``,
which are RE2 — the SAME regex engine DuckDB uses — so the SQL twin built
from the identical pattern strings (``scrub_sql``) matches byte-for-byte
with no Python-re/RE2 dialect drift. No per-row Python anywhere.

Rules apply IN ORDER, each to the output of the previous redaction (an
email's digits are already ``<EMAIL>`` when the number rule runs), and
each rule's count is taken immediately before its own redaction. Patterns
are RE2-safe (no backreferences/lookaround) by construction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# (name, RE2 pattern, replacement) — ordered; counts/redactions cascade.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() -]{6,}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
]


class Scrubber:
    """Stateless vectorized batch fn (plain task map — RE2 programs are
    compiled inside the Arrow kernels per call, which is cheap; no actor
    state needed)."""

    def __init__(self, text_col: str, id_col: str,
                 rules: list[tuple[str, str, str]] | None = None) -> None:
        self.text_col, self.id_col = text_col, id_col
        self.rules = SCRUB_RULES if rules is None else rules

    def __call__(self, t: pa.Table) -> pa.Table:
        s = t[self.text_col]
        if s.type != pa.string():
            s = pc.cast(s, pa.string())
        out: dict[str, object] = {self.id_col: t[self.id_col]}
        for name, pat, repl in self.rules:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(s, pattern=pat), pa.int64())
            s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
        out["redacted"] = s
        return pa.table(out)


def scrub(ds: Dataset, text_col: str, id_col: str,
          rules: list[tuple[str, str, str]] | None = None) -> Dataset:
    return ds.map_batches(
        Scrubber(text_col, id_col, rules), batch_format="pyarrow")


def scrub_sql(table: str, text_col: str, id_col: str,
              rules: list[tuple[str, str, str]] | None = None) -> str:
    """DuckDB twin generated from the SAME rule list the engine runs —
    chained CTEs mirror the cascade (count before own redaction, applied
    to the previous rule's output)."""
    rules = SCRUB_RULES if rules is None else rules
    ctes = [f"s0 AS (SELECT {id_col}, {text_col} AS t0 FROM {table})"]
    for i, (name, pat, repl) in enumerate(rules):
        carried = "".join(f"n_{r[0]}, " for r in rules[:i])
        ctes.append(
            f"s{i + 1} AS (SELECT {id_col}, {carried}"
            f"len(regexp_extract_all(t{i}, '{pat}')) AS n_{name}, "
            f"regexp_replace(t{i}, '{pat}', '{repl}', 'g') AS t{i + 1} "
            f"FROM s{i})")
    last = len(rules)
    cols = ", ".join(f"n_{name}" for name, _, _ in rules)
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {id_col}, {cols}, t{last} AS redacted FROM s{last}")
