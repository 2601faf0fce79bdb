"""PII detection / redaction over a text column — a first-class curation
operator for training-data pipelines (strip emails, phone numbers, IP
addresses, SSN-shaped ids before training).

Reference analog: the pattern-screen rules of the validators
(src/validators/bio_rules.py:96-133 — compiled-regex screens over a text
column); here the patterns target PII instead of sequence motifs and the
kernels are pure Arrow (``pc.count_substring_regex`` /
``pc.replace_substring_regex``), so a batch never leaves the object store
as Python objects.

Both Arrow and DuckDB regexes are RE2, so the same pattern strings state
the oracle exactly (leftmost non-overlapping matches, global replace).

Scale shape: row-local ``map_batches`` — no shuffle, no state; redaction
rewrites only the text column of each batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Order matters for redaction (applied sequentially): emails first so
# digit-bearing domains can't be half-claimed by the ipv4 pass, phones
# before SSN so a phone's digit groups are gone before the 3-2-4 screen.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_stats(t: pa.Table, col: str = "text") -> pa.Table:
    """Append one ``n_<kind>`` int64 count column per PII pattern plus the
    ``n_pii`` total. Counts are leftmost non-overlapping matches on the
    ORIGINAL text (patterns are screened independently, not sequentially).
    Null text counts as empty (0 everywhere) so the n_* columns stay a
    total classification — a null n_pii would drop the row from BOTH
    sides of a `n_pii > 0` split."""
    text = pc.fill_null(t[col], "")
    total = None
    for name, pattern in PII_PATTERNS:
        n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        t = t.append_column(f"n_{name}", n)
        total = n if total is None else pc.add(total, n)
    return t.append_column("n_pii", total)


def redact_pii(t: pa.Table, col: str = "text",
               out: str | None = None) -> pa.Table:
    """Replace every PII match with ``[KIND]``, applying the patterns in
    PII_PATTERNS order (sequential rewrite — later patterns see earlier
    placeholders). Writes ``out`` (default: in place over ``col``)."""
    text = t[col]
    for name, pattern in PII_PATTERNS:
        text = pc.replace_substring_regex(text, pattern,
                                          f"[{name.upper()}]")
    out = out or col
    if out in t.column_names:
        t = t.set_column(t.schema.get_field_index(out), out, text)
    else:
        t = t.append_column(out, text)
    return t


def scan_pii(ds, col: str = "text"):
    """Dataset-level PII scan: id/metadata columns pass through with the
    per-kind counts appended."""
    return ds.map_batches(lambda t: pii_stats(t, col=col),
                          batch_format="pyarrow")


def redact_dataset(ds, col: str = "text", out: str | None = None):
    """Dataset-level redaction (row-local, streaming)."""
    return ds.map_batches(lambda t: redact_pii(t, col=col, out=out),
                          batch_format="pyarrow")
