"""PII redaction — mask emails / payment-card-like numbers / IPv4 addresses /
phone-like digit runs in a text column, with per-category match counts.

A standard training-data hygiene stage (alongside stages/decontaminate.py and
stages/curation.py), absent from the reference (which has no corpus-curation
stages at all; cf. its single-corpus scripts under /root/reference/scripts/).

Scale design (100 TB corpus):

  * Stateless, embarrassingly parallel: one ``map_batches`` over zero-copy
    Arrow, each category one ``pc.count_substring_regex`` + one
    ``pc.replace_substring_regex`` pass over the batch — no Python row loop,
    no shuffle, no driver state. Throughput is bounded by RE2, which scans
    linearly in input size.
  * EXACT oracle contract: Arrow's regex engine is RE2 and so is DuckDB's
    ``regexp_replace`` / ``regexp_extract_all`` — the SAME pattern strings
    (module constant ``REDACTIONS``) run on both sides with identical
    leftmost-match semantics, so redacted text and counts agree byte-for-byte
    (same rationale as stages/text_analysis.py's RE2 notes).
  * ORDERED application: categories apply in ``REDACTIONS`` order, each on
    the output of the previous (an email's digits must not later be re-matched
    as a phone; a card must be masked before the looser phone pattern sees
    it). Counts are taken on the text as-of that category's step, i.e. they
    count matches actually redacted.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# (category, RE2 pattern, mask). Order matters — see module docstring.
# Patterns are deliberately simple/auditable (RE2 has no lookaround): the
# goal is high-recall masking for training corpora, not RFC validation.
REDACTIONS: Tuple[Tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[ \-]?\d{4}[ \-]?\d{4}[ \-]?\d{4}\b", "<CARD>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ .\-]?\(?\d{3,4}\)?[ .\-]?\d{3,4}[ .\-]?\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(
    batch: pa.Table,
    text_col: str = "text",
    categories: Optional[Sequence[str]] = None,
) -> pa.Table:
    """Vectorized per-batch kernel: replaces ``text_col`` with the redacted
    text and appends one ``n_<category>`` int64 column per category (count of
    matches redacted at that category's step)."""
    wanted = [r for r in REDACTIONS if categories is None or r[0] in categories]
    txt = pc.fill_null(batch[text_col].combine_chunks(), "")
    counts = []
    for name, pattern, mask in wanted:
        counts.append((name, pc.count_substring_regex(txt, pattern=pattern)))
        txt = pc.replace_substring_regex(txt, pattern=pattern, replacement=mask)
    out = batch.set_column(batch.schema.get_field_index(text_col), text_col, txt)
    for name, cnt in counts:
        out = out.append_column(f"n_{name}", pc.cast(cnt, pa.int64()))
    return out


def redact_pii(
    ds: Dataset,
    text_col: str = "text",
    categories: Optional[Sequence[str]] = None,
) -> Dataset:
    """Stream the corpus through the redaction kernel. Stateless map — no
    actor pool needed (RE2 patterns compile per task in microseconds; there
    is no model/index state to cache)."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col=text_col, categories=categories),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_redact_sql(text_expr: str, categories: Optional[Sequence[str]] = None) -> dict:
    """Build the DuckDB expressions that replicate :func:`redact_pii_batch`
    exactly — returns ``{"text": <redacted expr>, "n_<cat>": <count expr>}``
    over the given SQL text expression. Single source of truth for the
    patterns so the Ray kernel and the SQL oracle cannot drift."""
    wanted = [r for r in REDACTIONS if categories is None or r[0] in categories]
    cur = text_expr
    out = {}
    for name, pattern, mask in wanted:
        pat_sql = pattern.replace("'", "''")
        out[f"n_{name}"] = f"CAST(length(regexp_extract_all({cur}, '{pat_sql}')) AS BIGINT)"
        cur = f"regexp_replace({cur}, '{pat_sql}', '{mask}', 'g')"
    out["text"] = cur
    return out
