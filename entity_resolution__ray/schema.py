"""Explicit pyarrow schemas for every logical table.

The reference passes implicit pandas/CSV schemas between stages (column names
hard-coded, e.g. /root/reference/scripts/run_blocking.py:9-10); here every stage
contract is a real ``pyarrow.Schema``.

Primary input shape follows BASELINE.json ``input_hint``:
``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# docs — the interleaved text+media document table (reference analogue:
# data/original/affiliationstrings_ids.csv columns id1,affil1 lifted into spans)
# ---------------------------------------------------------------------------
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "media"
        pa.field("text", pa.string()),       # text payload ("" for media spans)
        pa.field("media_ref", pa.string()),  # media URI ("" for text spans)
        pa.field("offset", pa.int32()),      # strictly increasing span order
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# docs after normalization — spans preserved byte-identically, derived columns added
NORMALIZED_DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("full_text", pa.string()),   # concat of text spans in offset order (== affil1)
        pa.field("norm_text", pa.string()),   # lowercase, accent-stripped, space-joined tokens
        pa.field("tokens", pa.list_(pa.string())),
        pa.field("countries", pa.list_(pa.string())),  # canonical lower-case country mentions
    ]
)

# blocking keys, exploded: one row per (doc, key)
BLOCK_KEYS_SCHEMA = pa.schema(
    [
        pa.field("block_key", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("norm_text", pa.string()),
    ]
)

# candidate pairs, canonical (id_left < id_right), undirected-collapsed
# (reference analogue: run_blocking.py:57,76 src_id,cand_id,cosine_sim)
CANDIDATE_PAIRS_SCHEMA = pa.schema(
    [
        pa.field("id_left", pa.string()),
        pa.field("id_right", pa.string()),
        pa.field("block_key", pa.string()),
        pa.field("sim", pa.float64()),
    ]
)

FEATURE_COLS = [
    "edit_ratio",
    "jaro_winkler",
    "lcs_ratio",
    "token_jaccard",
    "token_cosine",
    "tfidf_word_cosine",
    "tfidf_char_cosine",
    "dmetaphone_match",
]  # order matches reference SELECTED_FEATURES (feautre_extraction.py:104-113)

PAIR_FEATURES_SCHEMA = pa.schema(
    [
        pa.field("id_left", pa.string()),
        pa.field("id_right", pa.string()),
        pa.field("sim", pa.float64()),
    ]
    + [pa.field(c, pa.float64()) for c in FEATURE_COLS]
)

# scored edges (reference analogue: train_classifier.py:27-30)
EDGES_SCHEMA = pa.schema(
    [
        pa.field("id_left", pa.string()),
        pa.field("id_right", pa.string()),
        pa.field("prob_match", pa.float64()),
        pa.field("pred_match", pa.int8()),
    ]
)

# final clusters (reference analogue: er_clusters_transitive.csv)
CLUSTERS_SCHEMA = pa.schema(
    [
        pa.field("node_id", pa.string()),
        pa.field("cluster_id", pa.int64()),
        pa.field("cluster_size", pa.int64()),
    ]
)

# per-partition lineage manifest row (FIXTURES.md §4 "stage manifest")
MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("rows_dropped", pa.int64()),
        pa.field("wall_s", pa.float64()),
    ]
)
