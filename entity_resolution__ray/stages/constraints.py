"""Constraint filtering over scored edges (M8 + C1 + C2 + C3).

Reference analogues:
  * probability threshold — apply_constraints.py:40 (min_prob=0.45 at :79)
  * geo-mismatch prune — geo_constraints.py:112-152: prune iff BOTH sides
    mention ≥1 whitelisted country AND the sets are disjoint (conservative
    when either side is unknown, :143-145)
  * token-overlap prune — token_overlap_constraint.py:16-70: stopword-aware
    Jaccard < 0.20 prunes, but NEVER when stopword removal empties a side
  * composition + kept/dropped side outputs + stats — apply_constraints.py:15-67

Engine shape: instead of building driver-side prune *dicts* keyed by pair (the
reference's O(pairs) driver memory), each constraint is a vectorized
``map_batches`` verdict over the edge stream — edges gain ``keep`` +
``drop_reason`` columns; kept/dropped splits are cheap filters (run off a
Parquet checkpoint so the stream isn't recomputed twice). Countries are looked
up from the per-doc ``countries`` column (M6 — computed once per doc, not per
pair like the reference's geo_constraints.py:137-141).
"""

from __future__ import annotations

from typing import Optional, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

DEFAULT_MIN_PROB = 0.45  # apply_constraints.py:79
TOKEN_OVERLAP_MIN_JACCARD = 0.20  # token_overlap_constraint.py:27


def threshold_filter(edges: Dataset, min_prob: float = DEFAULT_MIN_PROB) -> Dataset:
    """Keep edges with prob_match >= min_prob (M8)."""
    return edges.map_batches(
        lambda t, mp=min_prob: t.filter(pc.greater_equal(t["prob_match"], mp)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def drop_self_pairs(edges: Dataset) -> Dataset:
    """M9 — self-pairs are impossible for canonical pairs but kept as an
    explicit guard (run_blocking.py:51-52)."""
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["id_left"], t["id_right"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class ConstraintVerdict:
    """Batch fn: edges with side columns → + keep:bool, drop_reason:string.

    Expects columns src_countries/cand_countries (geo) and/or
    src_text/cand_text (token overlap) to be attached (stages.joins)."""

    def __init__(
        self,
        use_geo: bool = True,
        use_token_overlap: bool = False,
        stopwords: Optional[Set[str]] = None,
        min_jaccard: float = TOKEN_OVERLAP_MIN_JACCARD,
    ):
        self.use_geo = use_geo
        self.use_token_overlap = use_token_overlap
        self.stopwords = stopwords or set()
        self.min_jaccard = min_jaccard

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keep = np.ones(n, dtype=bool)
        reason = [""] * n

        if self.use_geo:
            a_c = batch["src_countries"].to_pylist()
            b_c = batch["cand_countries"].to_pylist()
            for i in range(n):
                ca = set(a_c[i] or ())
                cb = set(b_c[i] or ())
                # conservative when either side unknown (geo_constraints.py:143-145)
                if ca and cb and ca.isdisjoint(cb):
                    keep[i] = False
                    reason[i] = f"geo_mismatch:{';'.join(sorted(ca))}|{';'.join(sorted(cb))}"

        if self.use_token_overlap:
            sw = self.stopwords
            a_t = batch["src_text"].to_pylist()
            b_t = batch["cand_text"].to_pylist()
            for i in range(n):
                if not keep[i]:
                    continue
                at = set((a_t[i] or "").split(" ")) - {""} - sw
                bt = set((b_t[i] or "").split(" ")) - {""} - sw
                # never prune when a side empties out (token_overlap_constraint.py:63-65)
                if not at or not bt:
                    continue
                jac = len(at & bt) / len(at | bt)
                if jac < self.min_jaccard:
                    keep[i] = False
                    reason[i] = f"token_overlap<{self.min_jaccard:.2f}"

        return batch.append_column("keep", pa.array(keep)).append_column(
            "drop_reason", pa.array(reason, type=pa.string())
        )


def apply_constraints(
    edges_with_sides: Dataset,
    min_prob: float = DEFAULT_MIN_PROB,
    use_geo: bool = True,
    use_token_overlap: bool = False,
    stopwords: Optional[Set[str]] = None,
    min_jaccard: float = TOKEN_OVERLAP_MIN_JACCARD,
    concurrency=(1, 8),
) -> Dataset:
    """Threshold + constraint verdicts (C3). Returns the stream with
    keep/drop_reason columns; use :func:`split_kept_dropped` on a checkpointed
    copy for the two side outputs."""
    thresholded = threshold_filter(edges_with_sides, min_prob)
    verdict = ConstraintVerdict(
        use_geo=use_geo, use_token_overlap=use_token_overlap,
        stopwords=stopwords, min_jaccard=min_jaccard,
    )

    def apply_verdict(batch: pa.Table) -> pa.Table:
        return verdict(batch)

    return thresholded.map_batches(apply_verdict, batch_format="pyarrow", zero_copy_batch=True)


def split_kept_dropped(verdict_ds: Dataset) -> Tuple[Dataset, Dataset]:
    """kept rows / dropped rows (apply_constraints.py:59-65 side outputs)."""
    kept = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)), batch_format="pyarrow", zero_copy_batch=True
    )
    dropped = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], False)), batch_format="pyarrow", zero_copy_batch=True
    )
    return kept, dropped
