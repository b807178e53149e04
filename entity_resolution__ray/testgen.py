"""Deterministic synthetic ER fixture corpus (FIXTURES.md §1-3).

Generates an affiliation-string corpus in the interleaved-document shape of
BASELINE.json ``input_hint`` — ``doc_id:string,
spans:list<struct<kind,text,media_ref,offset>>`` — with known entity clusters,
mirroring the proportions of the reference corpus
(/root/reference/data/original/affiliationstrings_ids.csv: 2,260 records,
330 true clusters, largest 47).

Per-entity variants exercise every feature kernel (FIXTURES.md §1): typos and
transpositions (edit_ratio, jaro_winkler), token reorderings (token_jaccard,
token_cosine), acronym dotting USA↔U.S.A. (geo_constraints.py:30-46), alias
swaps USA↔United States (geo_constraints.py:14-27), accent variants é→e
(common_methods.py:10-11), punctuation noise, and — across *clone* entities —
country substitutions that make textually-near cross-entity pairs for the geo
constraint to prune.

Everything is seeded; no wall-clock or global randomness.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from .schema import DOCS_SCHEMA

# 20-country whitelist (src/constraints/geo_constraints.py:6-11) with alias forms
_COUNTRY_FORMS: Dict[str, List[str]] = {
    "United States": ["United States", "USA", "U.S.A.", "US"],
    "United Kingdom": ["United Kingdom", "UK"],
    "Taiwan": ["Taiwan", "ROC"],
    "China": ["China", "P.R. China"],
    "United Arab Emirates": ["United Arab Emirates", "UAE"],
    "Switzerland": ["Switzerland"],
    "Greece": ["Greece"],
    "Singapore": ["Singapore"],
    "Germany": ["Germany"],
    "Hong Kong": ["Hong Kong"],
    "Canada": ["Canada"],
    "Italy": ["Italy"],
    "France": ["France"],
    "Australia": ["Australia"],
    "India": ["India"],
    "Netherlands": ["Netherlands"],
    "Israel": ["Israel"],
    "Japan": ["Japan"],
    "Brazil": ["Brazil"],
    "Denmark": ["Denmark"],
}
_COUNTRIES = sorted(_COUNTRY_FORMS)

_CITIES: Dict[str, List[str]] = {
    "United States": ["San Jose", "Berkeley", "Chicago", "Boston", "Austin"],
    "United Kingdom": ["Cambridge", "Oxford", "London"],
    "Taiwan": ["Taipei", "Hsinchu"],
    "China": ["Beijing", "Shanghai", "Hangzhou"],
    "United Arab Emirates": ["Abu Dhabi", "Dubai"],
    "Switzerland": ["Zurich", "Geneva", "Lausanne"],
    "Greece": ["Athens", "Thessaloniki"],
    "Singapore": ["Singapore"],
    "Germany": ["Munich", "Berlin", "Heidelberg"],
    "Hong Kong": ["Kowloon", "Sha Tin"],
    "Canada": ["Toronto", "Vancouver", "Montreal"],
    "Italy": ["Rome", "Milan", "Pisa"],
    "France": ["Paris", "Grenoble", "Lyon"],
    "Australia": ["Sydney", "Melbourne", "Canberra"],
    "India": ["Mumbai", "Bangalore", "Delhi"],
    "Netherlands": ["Amsterdam", "Delft", "Eindhoven"],
    "Israel": ["Haifa", "Tel Aviv", "Rehovot"],
    "Japan": ["Tokyo", "Kyoto", "Osaka"],
    "Brazil": ["Sao Paulo", "Campinas"],
    "Denmark": ["Copenhagen", "Aarhus"],
}

_ORG_KINDS = ["University", "Institute", "Laboratory", "Research Center", "College", "Polytechnic"]
_ORG_NAMES = [
    "Almaden", "Watson", "Fairview", "Hilltop", "Riverside", "Lakeside", "Northgate",
    "Eastwood", "Westfield", "Southport", "Maplewood", "Oakridge", "Pinecrest",
    "Silverlake", "Goldstone", "Ironwood", "Bluefield", "Redstone", "Greenhill",
    "Whitewater", "Blackrock", "Stonebridge", "Clearwater", "Brightmore", "Hollybrook",
    "Ashford", "Birchwood", "Cedarvale", "Dunmore", "Elmhurst", "Foxglove", "Glenview",
]
_DEPTS = [
    "Department of Computer Science", "School of Engineering", "Institute of Physics",
    "Department of Mathematics", "Center for Data Science", "Faculty of Medicine",
    "Department of Chemistry", "School of Information",
]
_ACCENT_SWAPS = [("e", "é"), ("a", "à"), ("u", "ü"), ("o", "ö")]


def _entity_template(rng: np.random.RandomState, clone_of: dict | None = None) -> dict:
    """An entity = canonical affiliation parts. A *clone* shares org text but
    lives in a different country (textual near-match, true non-match)."""
    if clone_of is not None:
        country = _COUNTRIES[rng.randint(len(_COUNTRIES))]
        while country == clone_of["country"]:
            country = _COUNTRIES[rng.randint(len(_COUNTRIES))]
        city = _CITIES[country][rng.randint(len(_CITIES[country]))]
        return {**clone_of, "country": country, "city": city}
    country = _COUNTRIES[rng.randint(len(_COUNTRIES))]
    return {
        "org": f"{_ORG_NAMES[rng.randint(len(_ORG_NAMES))]} {_ORG_KINDS[rng.randint(len(_ORG_KINDS))]}",
        "dept": _DEPTS[rng.randint(len(_DEPTS))] if rng.rand() < 0.5 else "",
        "city": _CITIES[country][rng.randint(len(_CITIES[country]))],
        "country": country,
    }


def _render(ent: dict, rng: np.random.RandomState) -> str:
    """Render one variant affiliation string with seeded perturbations."""
    country_forms = _COUNTRY_FORMS[ent["country"]]
    country = country_forms[rng.randint(len(country_forms))]
    parts = [p for p in (ent["dept"], ent["org"], ent["city"], country) if p]
    # token reordering: occasionally move dept after org or drop it
    if ent["dept"] and rng.rand() < 0.3:
        parts = [p for p in (ent["org"], ent["dept"], ent["city"], country) if p]
    if ent["dept"] and rng.rand() < 0.2:
        parts = [p for p in (ent["org"], ent["city"], country) if p]
    sep = [", ", "; ", " - ", ", "][rng.randint(4)]
    s = sep.join(parts)
    # typo: transpose or drop one letter inside the org name area (≤1 per doc)
    r = rng.rand()
    if r < 0.25 and len(s) > 10:
        i = rng.randint(2, len(s) - 3)
        if s[i].isalpha() and s[i + 1].isalpha():
            s = s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    elif r < 0.40 and len(s) > 10:
        i = rng.randint(2, len(s) - 3)
        if s[i].isalpha():
            s = s[:i] + s[i + 1 :]
    # accent variant
    if rng.rand() < 0.2:
        plain, accented = _ACCENT_SWAPS[rng.randint(len(_ACCENT_SWAPS))]
        s = s.replace(plain, accented, 1)
    # punctuation noise
    if rng.rand() < 0.15:
        s = s + "."
    return s


def _to_spans(doc_id: str, text: str, rng: np.random.RandomState) -> List[dict]:
    """Split text into 1-3 text spans at separator boundaries and interleave
    0-2 media spans; offsets strictly increasing (FIXTURES.md §1)."""
    pieces: List[str] = []
    if ", " in text and rng.rand() < 0.5:
        head, _, tail = text.partition(", ")
        pieces = [head + ", ", tail]
    else:
        pieces = [text]
    if len(pieces) == 2 and ", " in pieces[1] and rng.rand() < 0.3:
        head, _, tail = pieces[1].partition(", ")
        pieces = [pieces[0], head + ", ", tail]

    spans: List[dict] = []
    n_media = rng.randint(0, 3)
    media_positions = set(rng.choice(len(pieces) + 1, size=n_media, replace=True).tolist())
    offset = 0
    media_i = 0
    for pos in range(len(pieces) + 1):
        if pos in media_positions:
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"media://{doc_id}/{media_i}", "offset": offset}
            )
            offset += 1
            media_i += 1
        if pos < len(pieces):
            spans.append({"kind": "text", "text": pieces[pos], "media_ref": "", "offset": offset})
            offset += 1
    return spans


def full_text_of_spans(spans: List[dict]) -> str:
    """Concatenate kind=="text" span texts in offset order (M11)."""
    return "".join(s["text"] for s in sorted(spans, key=lambda x: x["offset"]) if s["kind"] == "text")


def generate_corpus(
    n_entities: int = 330,
    max_cluster: int = 47,
    clone_frac: float = 0.15,
    seed: int = 42,
) -> Tuple[pa.Table, pa.Table, pa.Table]:
    """Returns (docs, golden_clusters, golden_pairs) pyarrow tables.

    docs:            DOCS_SCHEMA
    golden_clusters: doc_id, cluster_id (entity index), cluster_size
    golden_pairs:    id_left, id_right, label (1 = same entity) — all positive
                     within-entity pairs plus seeded hard negatives across
                     textually-similar (clone) entities and shared-city pairs.
    """
    rng = np.random.RandomState(seed)

    entities: List[dict] = []
    clone_groups: List[List[int]] = []
    i = 0
    while len(entities) < n_entities:
        ent = _entity_template(rng)
        entities.append(ent)
        group = [i]
        i += 1
        # clones: same org text, different country → geo-negative material
        while len(entities) < n_entities and rng.rand() < clone_frac:
            entities.append(_entity_template(rng, clone_of=ent))
            group.append(i)
            i += 1
        clone_groups.append(group)

    # cluster sizes: skewed, capped; force one cluster to max_cluster
    sizes = np.minimum(1 + rng.geometric(p=0.18, size=n_entities) + rng.binomial(4, 0.3, size=n_entities), max_cluster)
    sizes[int(rng.randint(n_entities))] = max_cluster

    doc_rows: List[dict] = []
    cluster_rows: List[dict] = []
    entity_docs: List[List[str]] = [[] for _ in range(n_entities)]
    for e_idx, (ent, size) in enumerate(zip(entities, sizes)):
        for _ in range(int(size)):
            doc_id = f"d{len(doc_rows):06d}"
            text = _render(ent, rng)
            doc_rows.append({"doc_id": doc_id, "spans": _to_spans(doc_id, text, rng)})
            entity_docs[e_idx].append(doc_id)
    for e_idx, docs in enumerate(entity_docs):
        for d in docs:
            cluster_rows.append({"doc_id": d, "cluster_id": e_idx, "cluster_size": len(docs)})

    # golden pairs: all within-entity positives
    pair_rows: List[dict] = []
    for docs in entity_docs:
        for a, b in itertools.combinations(docs, 2):
            lo, hi = (a, b) if a < b else (b, a)
            pair_rows.append({"id_left": lo, "id_right": hi, "label": 1})
    # hard negatives #1: across clone entities (near-identical text, different country)
    for group in clone_groups:
        if len(group) < 2:
            continue
        for ea, eb in itertools.combinations(group, 2):
            for a in entity_docs[ea][:3]:
                for b in entity_docs[eb][:3]:
                    lo, hi = (a, b) if a < b else (b, a)
                    pair_rows.append({"id_left": lo, "id_right": hi, "label": 0})
    # hard negatives #2: same-city different-entity samples
    by_city: Dict[str, List[int]] = {}
    for e_idx, ent in enumerate(entities):
        by_city.setdefault(ent["city"], []).append(e_idx)
    for _city, es in sorted(by_city.items()):
        if len(es) < 2:
            continue
        for ea, eb in itertools.combinations(es[:6], 2):
            a = entity_docs[ea][0]
            b = entity_docs[eb][0]
            lo, hi = (a, b) if a < b else (b, a)
            pair_rows.append({"id_left": lo, "id_right": hi, "label": 0})

    docs_tbl = pa.Table.from_pylist(doc_rows, schema=DOCS_SCHEMA)
    clusters_tbl = pa.Table.from_pylist(
        cluster_rows,
        schema=pa.schema(
            [pa.field("doc_id", pa.string()), pa.field("cluster_id", pa.int64()), pa.field("cluster_size", pa.int64())]
        ),
    )
    # dedupe pairs (a pair can be emitted once only; negatives never collide with positives)
    seen = set()
    uniq = []
    for r in pair_rows:
        k = (r["id_left"], r["id_right"])
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    pairs_tbl = pa.Table.from_pylist(
        uniq,
        schema=pa.schema(
            [pa.field("id_left", pa.string()), pa.field("id_right", pa.string()), pa.field("label", pa.int8())]
        ),
    )
    return docs_tbl, clusters_tbl, pairs_tbl


def write_fixture(out_dir: str, n_entities: int = 330, seed: int = 42) -> dict:
    """Write docs/golden_clusters/golden_pairs parquet under out_dir; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs, clusters, pairs = generate_corpus(n_entities=n_entities, seed=seed)
    paths = {
        "docs": os.path.join(out_dir, "docs.parquet"),
        "golden_clusters": os.path.join(out_dir, "golden_clusters.parquet"),
        "golden_pairs": os.path.join(out_dir, "golden_pairs.parquet"),
    }
    pq.write_table(docs, paths["docs"])
    pq.write_table(clusters, paths["golden_clusters"])
    pq.write_table(pairs, paths["golden_pairs"])
    return paths
