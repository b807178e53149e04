"""Geographic normalization + country extraction
(reference: /root/reference/src/constraints/geo_constraints.py).

Semantics pinned to the reference:
  * 20-country whitelist (geo_constraints.py:6-11)
  * ordered acronym/alias → canonical-country substitutions, whitelist-filtered,
    case-insensitive (geo_constraints.py:14-27,48-70)
  * dotted-acronym undotting ``U.S.A.`` → ``USA`` incl. spaced dots
    (geo_constraints.py:30-46)
  * word-boundary country detection → set of lower-case canonical names
    (geo_constraints.py:72-110)

Unlike the reference (which re-extracts countries per *pair*,
geo_constraints.py:137-141), the engine computes countries once per *document*
in a ``map_batches`` stage and joins them onto pairs — same result, linear not
quadratic work (SURVEY.md M6/C2).
"""

from __future__ import annotations

import re
from typing import List, Optional, Set, Tuple

GEO_COUNTRIES_WHITE_LIST: Set[str] = {
    "United States", "United Kingdom", "Taiwan", "China", "United Arab Emirates",
    "Switzerland", "Greece", "Singapore", "Germany", "Hong Kong", "Canada",
    "Italy", "France", "Australia", "India", "Netherlands", "Israel",
    "Japan", "Brazil", "Denmark",
}

ACRONYM_MAP_ORDERED: List[Tuple[str, str]] = [
    (r"\bUSA\b", "United States"),
    (r"\bUS\b", "United States"),
    (r"\bUK\b", "United Kingdom"),
    (r"\bROC\b", "Taiwan"),
    (r"\bP\.?\s*R\.?\s*China\b", "China"),
    (r"\bPeople's Republic of China\b", "China"),
    (r"\bUAE\b", "United Arab Emirates"),
    (r"\bCH\b", "Switzerland"),
    (r"\bGR(?=[\W_]|$)", "Greece"),
    (r"\bS\'?pore(?=[\W_]|$)", "Singapore"),
    (r"\bSingapor(?=[\W_]|$)", "Singapore"),
    (r"\bHong\s*Kong\b", "Hong Kong"),
]

# dotted acronyms like U.S.A., U.S., E.U. (optionally with spaces)
PATTERN_DOTTED = re.compile(r"(?<![A-Za-z])(?:[A-Z]\.){2,}[A-Z]?(?=\W|$)")


def undot_acronyms(text: str) -> str:
    """``U.S.A.`` → ``USA`` (geo_constraints.py:38-46)."""
    if not isinstance(text, str) or not text:
        return ""

    def _repl(m: re.Match) -> str:
        return m.group(0).replace(".", "").replace(" ", "")

    return PATTERN_DOTTED.sub(_repl, text)


def _compiled_subs() -> List[Tuple[re.Pattern, str]]:
    return [
        (re.compile(pat, re.IGNORECASE), repl)
        for pat, repl in ACRONYM_MAP_ORDERED
        if repl in GEO_COUNTRIES_WHITE_LIST
    ]


def _compiled_country_patterns() -> dict[str, re.Pattern]:
    return {
        c.lower(): re.compile(rf"(?<!\w){re.escape(c)}(?!\w)", re.IGNORECASE)
        for c in GEO_COUNTRIES_WHITE_LIST
    }


class CountryExtractor:
    """Precompiled normalizer + detectors; build once per actor/worker, apply
    per string. Picklable via re-compilation (regexes are module-derived)."""

    def __init__(self, restrict_to: Optional[Set[str]] = None):
        self.subs = _compiled_subs()
        self.patterns = _compiled_country_patterns()
        self.restrict_to = {c.lower().strip() for c in restrict_to} if restrict_to else None

    def normalize(self, text: str) -> str:
        if not isinstance(text, str) or not text:
            return ""
        out = undot_acronyms(text)
        for preg, repl in self.subs:
            out = preg.sub(repl, out)
        return out

    def extract(self, text: str) -> List[str]:
        """Sorted list of canonical lower-case countries mentioned in text."""
        normalized = self.normalize(text)
        out: Set[str] = set()
        if normalized:
            for cname, pat in self.patterns.items():
                if pat.search(normalized):
                    out.add(cname)
        if self.restrict_to:
            out &= self.restrict_to
        return sorted(out)

    def extract_batch(self, texts) -> List[List[str]]:
        return [self.extract(t) for t in texts]

    def __reduce__(self):
        return (CountryExtractor, (self.restrict_to,))
