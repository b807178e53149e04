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


def _compiled_alias_alternation() -> Tuple[re.Pattern, dict]:
    """ALL whitelist-filtered alias patterns as one alternation with named
    groups — one ``finditer`` pass replaces the per-alias sub loop. An alias
    hit implies the substituted text would contain the canonical name, so
    detection can map the hit directly without rewriting the string. Safe
    because no substitution output (canonical country name) itself matches
    another alias or a different country pattern."""
    branches, group_of = [], {}
    for i, (pat, repl) in enumerate(ACRONYM_MAP_ORDERED):
        if repl not in GEO_COUNTRIES_WHITE_LIST:
            continue
        g = f"a{i}"
        group_of[g] = repl.lower()
        branches.append(f"(?P<{g}>{pat})")
    return re.compile("|".join(branches), re.IGNORECASE), group_of


def _compiled_country_alternation() -> re.Pattern:
    """All canonical names as one alternation (longest first so e.g.
    ``United Arab Emirates`` wins over a hypothetical prefix)."""
    names = sorted(GEO_COUNTRIES_WHITE_LIST, key=len, reverse=True)
    alt = "|".join(re.escape(c) for c in names)
    return re.compile(rf"(?<!\w)(?:{alt})(?!\w)", re.IGNORECASE)


_CANONICAL_LOWER = {c.lower(): c.lower() for c in GEO_COUNTRIES_WHITE_LIST}


class CountryExtractor:
    """Precompiled normalizer + detectors; build once per actor/worker, apply
    per string. Picklable via re-compilation (regexes are module-derived).

    Detection runs THREE regex passes per string (undot, alias alternation,
    canonical-name alternation) instead of the reference's 12 substitutions +
    20 searches — same extracted set (gated by test_geo parity and the
    real-corpus geo-conformance test), ~10× less regex work per document."""

    def __init__(self, restrict_to: Optional[Set[str]] = None):
        self.subs = _compiled_subs()
        self.alias_rx, self.alias_of = _compiled_alias_alternation()
        self.country_rx = _compiled_country_alternation()
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
        if not isinstance(text, str) or not text:
            return []
        undotted = undot_acronyms(text)
        out: Set[str] = {self.alias_of[m.lastgroup] for m in self.alias_rx.finditer(undotted)}
        # canonical names are escaped literals, so a hit lowers to the
        # whitelist key exactly
        out.update(m.group(0).lower() for m in self.country_rx.finditer(undotted))
        if self.restrict_to:
            out &= self.restrict_to
        return sorted(out)

    def extract_batch(self, texts) -> List[List[str]]:
        return [self.extract(t) for t in texts]

    def __reduce__(self):
        return (CountryExtractor, (self.restrict_to,))
