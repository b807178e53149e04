"""NER tokenization stage (EP1: T1 NERExtractor + T2 TokenProcessor).

Reference analogues:
  * ``NERExtractor`` — /root/reference/models/ner/ner_extractor.py:18-105:
    spaCy ``en_core_web_trf`` with a HuggingFace ``dslim/bert-base-NER``
    backoff on empty/exception. NEITHER library ships in this container, so
    the transformer path raises ``NotImplementedError`` and the default
    backend is a deterministic rule-based extractor (capitalized-run → ORG,
    whitelist country → GPE, number → CARDINAL) that exercises the identical
    actor-pool plumbing: model "load" in ``__init__`` once per actor, batch
    extraction in ``__call__``, backoff hook on empty results.
  * ``TokenProcessor`` — /root/reference/models/ner/token_processor.py:10-75:
    semantics reproduced exactly — entity text rstripped of ``;:,``,
    case-insensitive dedup (keyed on (text.lower(), label) for the labeled
    column, text.lower() for the unlabeled one), joined with ``"; "``,
    formatted ``text<LABEL>``.

The reference's merge-back join (token_processor.py:69-75) disappears: columns
are appended in place on the same batch (no shuffle).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ray.data import Dataset

from ..functions.geo import GEO_COUNTRIES_WHITE_LIST


class RuleNERModel:
    """Deterministic rule-based stand-in for the spaCy/HF models."""

    def __init__(self):
        self.run_re = re.compile(r"(?:[A-Z][A-Za-z&\.]*)(?:\s+[A-Z][A-Za-z&\.]*)*")
        self.num_re = re.compile(r"\b\d+\b")
        self.countries_lower = {c.lower() for c in GEO_COUNTRIES_WHITE_LIST}

    def extract(self, text: str) -> List[Dict[str, str]]:
        out: List[Dict[str, str]] = []
        for m in self.run_re.finditer(text or ""):
            chunk = m.group(0).strip()
            if len(chunk) < 2:
                continue
            label = "GPE" if chunk.lower() in self.countries_lower else "ORG"
            out.append({"text": chunk, "label": label})
        for m in self.num_re.finditer(text or ""):
            out.append({"text": m.group(0), "label": "CARDINAL"})
        return out


class NERExtractor:
    """Actor-pool batch fn: full_text → entities + token columns.

    model_type="rule" (default) — deterministic heuristic above.
    model_type="spacy" / "hf" — the reference's transformer backends; raise
    NotImplementedError here (libs not installed) with the wiring point
    documented. ``backoff`` runs when the primary extractor returns nothing
    (ner_extractor.py:90-105 behavior).
    """

    def __init__(self, model_type: str = "rule", text_col: str = "full_text",
                 backoff: Optional[str] = "rule",
                 model_factory=None, backoff_factory=None):
        """``model_factory`` is the injection seam for real backends: a
        zero-arg picklable callable (top-level function / functools.partial —
        it ships to each actor) returning an object with
        ``extract(text) -> list[{"text": ..., "label": ...}]``. A user with
        spaCy installed wraps ``spacy.load(...)`` in such a factory; the load
        then runs ONCE PER ACTOR here in ``__init__``, never per batch.
        ``backoff_factory`` likewise for the backoff-on-empty model."""
        if model_factory is not None:
            self.model = model_factory()  # loaded once per actor
        elif model_type in ("spacy", "hf"):
            raise NotImplementedError(
                f"{model_type} NER backend requires spacy/transformers — not in this container; "
                "pass model_factory= to inject an installed backend, or use model_type='rule'"
            )
        else:
            self.model = RuleNERModel()  # loaded once per actor
        if backoff_factory is not None:
            self.backoff_model = backoff_factory()
        else:
            self.backoff_model = RuleNERModel() if backoff else None
        self.text_col = text_col

    # --- TokenProcessor semantics (token_processor.py:24-53) ---------------
    @staticmethod
    def _tokens_labeled(entities: List[Dict[str, str]]) -> str:
        seen = set()
        out = []
        for e in entities:
            text = (e.get("text") or "").strip().rstrip(";:,")
            label = (e.get("label") or "").strip()
            if not text:
                continue
            key = (text.lower(), label)
            if key in seen:
                continue
            seen.add(key)
            out.append(f"{text}<{label}>")
        return "; ".join(out)

    @staticmethod
    def _tokens_plain(entities: List[Dict[str, str]]) -> str:
        seen = set()
        out = []
        for e in entities:
            text = (e.get("text") or "").strip().rstrip(";:,")
            if not text:
                continue
            key = text.lower()
            if key in seen:
                continue
            seen.add(key)
            out.append(text)
        return "; ".join(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        plain, labeled = [], []
        for t in texts:
            ents = self.model.extract(t or "")
            if not ents and self.backoff_model is not None:
                ents = self.backoff_model.extract(t or "")  # backoff-on-empty
            plain.append(self._tokens_plain(ents))
            labeled.append(self._tokens_labeled(ents))
        return batch.append_column("affil_tokens", pa.array(plain, type=pa.string())).append_column(
            "affil_tokens_labeled", pa.array(labeled, type=pa.string())
        )


def ner_tokenize(docs: Dataset, text_col: str = "full_text", batch_size: int = 256,
                 concurrency=(1, 8), model_factory=None) -> Dataset:
    """EP1 as one actor-pool stage: read → extract → token columns in place.
    ``model_factory`` injects a custom NER backend (see NERExtractor)."""
    kwargs = {"text_col": text_col}
    if model_factory is not None:
        kwargs["model_factory"] = model_factory
    return docs.map_batches(
        NERExtractor,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
