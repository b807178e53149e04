"""Local replica of the driver's correctness gate: run each queries() entry at
sf0.001 and compare against its oracle_sql() (DuckDB) — column names, row
count, and order-insensitive values."""

import importlib.util
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def _load_entry():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(result):
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer) or df[c].dtype == np.uint64:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = [
    "m8_filter_project",
    "a4_token_df",
    "j1_revenue_by_nation",
    "a2_orders_by_customer",
    "j2_block_candidates",
    "f_pair_sims",
    "o1_topk_docs",
    "c4_connected_components",
    "w1_tumbling_window",
    "w2_session_window",
    "cur_stratified_sample",
    "cur_canonical_docs",
    "cur_lang_rollup",
    "dedup_exact",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "text_quality",
    "token_counts",
    "fingerprint_md5",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "lang_id",
    "cur_decontaminate",
    "cur_redact_pii",
    "cur_quality_gopher",
    "cur_remove_boilerplate",
    "w3_asof_join",
    "o2_topk_per_lang",
    "a5_quantiles_by_lang",
    "w4_hopping_window",
    "sj_bigram_join",
    "a6_distinct_users_by_type",
    "j4_customers_no_urgent_order",
    "a8_rollup_lineitem",
    "cur_chunk_documents",
    "hh_frequent_tokens",
    "j5_bloom_semi_revenue",
    "cur_zscore_by_type",
    "rj_purchase_window",
    "w5_running_sum",
    "cur_train_split",
    "km_assign_cells",
    "g1_cluster_chain_edges",
    "g2_cluster_star_edges",
    "g3_edges_from_predictions",
    "cur_dsir_scores",
    "dedup_substring",
    "dedup_substring_clusters",
    "mm_image_pixel_stats",
    "w6_user_event_seq",
    "w7_value_quartile",
    "a9_pivot_lineitem",
]


def test_sql_checked_list_is_complete(entry_mod):
    # every oracle-carrying query must be in the parity sweep above
    assert set(SQL_CHECKED) == set(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(entry_mod, oracle_con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _normalize(_to_pandas(q(SF_DIR)))
    want = _normalize(oracle_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=0)


def test_all_oracle_entries_have_queries(entry_mod):
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs, name


# Queries that are legitimately non-SQL-expressible and therefore carry no
# oracle_sql() entry. Each self-gates inside its own query path instead:
#   er_clusters              — model-driven; golden-partition F1 floor gate
#   hll_distinct_users_by_type — probabilistic sketch; gated on exact distinct
#   approx_quantiles_by_type — bottom-k sample; gated on exact-quantile bounds
#   cur_pack_sequences       — greedy FFD packing; gated on capacity/coverage
#   cur_chunk_pack           — chunk→pack composition; gated on exact token
#                              conservation across both stages + budget bound
#   semdedup_keep            — iterated k-means cells; gated on an exact
#                              driver-side re-derivation of the greedy prune
#   bpe_vocab_merges         — iterative BPE training; gated on exact merge-
#                              sequence equality vs the Sennrich reference
ROWS_ONLY = {
    "er_clusters",
    "hll_distinct_users_by_type",
    "approx_quantiles_by_type",
    "cur_pack_sequences",
    "cur_chunk_pack",
    "semdedup_keep",
    "bpe_vocab_merges",
}


def test_rows_only_set_is_exactly_the_documented_one(entry_mod):
    assert set(entry_mod.queries()) - set(entry_mod.oracle_sql()) == ROWS_ONLY


@pytest.mark.parametrize("name", sorted(ROWS_ONLY - {"er_clusters"}))
def test_rows_only_queries_run(entry_mod, name):
    # er_clusters is exercised (twice) by the scale-path parity test below;
    # the cheap rows-only queries run here so their self-gates fire in CI.
    out = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert len(out) > 0


def test_force_scale_paths_env_knob_parity(entry_mod, monkeypatch):
    """GRAFT_ER_FORCE_SCALE_PATHS=1 must flip er_clusters onto the
    beyond-object-store paths (features_mode=texts / attach_mode=join /
    renumber=hash via a ~0 probe budget) and produce the SAME cluster
    partition as the default broadcast paths. Partition comparison is by
    member-set (hash renumbering assigns different cluster ids than dense)."""

    def partition(df):
        groups = df.groupby("cluster_id")["node_id"].apply(lambda s: tuple(sorted(s)))
        return sorted(groups.tolist())

    q = entry_mod.queries()["er_clusters"]
    monkeypatch.delenv("GRAFT_ER_FORCE_SCALE_PATHS", raising=False)
    base = _to_pandas(q(SF_DIR))
    monkeypatch.setenv("GRAFT_ER_FORCE_SCALE_PATHS", "1")
    forced = _to_pandas(q(SF_DIR))
    assert partition(base) == partition(forced)
