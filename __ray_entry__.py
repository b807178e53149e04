"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship ER pipeline over /root/testdata/sf0.001 documents
(lifted to the interleaved-span shape), returning entity clusters.

``queries()`` — one callable per implemented operator family from SURVEY.md §2
plus the training-data operators (dedup / similarity / text analysis); each
takes ``sf_dir`` and returns a Dataset / DataFrame / pyarrow Table.

``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
(same column names, floats computed identically on both sides). All but five
queries carry exact oracles — including MinHash-LSH (recursive-CTE Jaccard
closure), SimHash (md5-replicable signatures), IVF (all-cells probe = exact
recall), k-means assignment (list_distance argmin) and language-ID (SQL
replica generated from the same profile dict). The five rows-only queries
are genuinely non-SQL (trained classifier / probabilistic sketches / greedy
packing / iterated k-means) and each SELF-GATES inside its query path — the
documented set lives in tests/test_queries_vs_oracle.ROWS_ONLY.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The package lives next to this file; make the import robust to the driver's
# cwd (the module may be exec'd by path from anywhere).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from entity_resolution__ray.functions import strsim
from entity_resolution__ray.functions.text_norm import tokens_array
from entity_resolution__ray.stages.clustering import cc_clusters
from entity_resolution__ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_candidates,
)
from entity_resolution__ray.stages.joins import hash_join
from entity_resolution__ray.stages.similarity import brute_force_topk
from entity_resolution__ray.stages.text_analysis import (
    _LANG_PROFILES,
    fingerprints,
    language_id,
    quality_score,
    token_counts,
)

_EN_STOPS = "('the','and','of','to','in','is','that','it','for','with','was','this')"


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _t(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# entry — flagship pipeline (smoke)
# ---------------------------------------------------------------------------
def _fixture_trained_model():
    """Matcher trained on the deterministic fixture corpus (the reference's
    train_classifier.py protocol). Cached on disk — the fixture, protocol and
    seed are all fixed, so the artifact is reproducible."""
    import pickle

    cache = "/tmp/er_fixture_model_v1.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.testgen import generate_corpus

    fx_docs, _, fx_pairs = generate_corpus(n_entities=40, seed=42)
    fx = run_er_pipeline(
        rd.from_arrow(fx_docs), labeled_pairs=fx_pairs, workdir=None, config=ERConfig(num_partitions=4)
    )
    with open(cache + ".tmp", "wb") as f:
        pickle.dump(fx["model"], f)
    os.replace(cache + ".tmp", cache)
    return fx["model"]


def entry() -> Any:
    """Docs → spans → normalize → blocking → features → matcher → constraints
    → CC clusters, on sf0.001. The matcher is trained on the deterministic
    fixture corpus (same protocol as the reference's train_classifier.py)."""
    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.sources.docs import read_flat_documents_as_docs

    docs = read_flat_documents_as_docs("/root/testdata/sf0.001")
    out = run_er_pipeline(
        docs, model=_fixture_trained_model(), workdir=None,
        config=ERConfig(num_partitions=8, use_geo=False, per_doc_topk=20, max_group_size=128),
    )
    return out["clusters_cc"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- sources / maps / filters (S1, M7, M8) -------------------------
        "m8_filter_project": _q_filter_project,
        # --- tokenization (M1/M2) + DF aggregate (A4/T7) -------------------
        "a4_token_df": _q_token_df,
        # --- joins (J1) ----------------------------------------------------
        "j1_revenue_by_nation": _q_revenue_by_nation,
        # --- grouped aggregates (A2/A5-like) -------------------------------
        "a2_orders_by_customer": _q_orders_by_customer,
        "a6_distinct_users_by_type": _q_distinct_users_by_type,
        # --- ROLLUP grouping sets (pre-aggregated shuffle cascade) ----------
        "a8_rollup_lineitem": _q_rollup_lineitem,
        # --- PIVOT (explicit column domain, single-pass partials) -----------
        "a9_pivot_lineitem": _q_pivot_lineitem,
        # --- distributed anti-join (J4 at scale) ----------------------------
        "j4_customers_no_urgent_order": _q_customers_no_urgent_order,
        # --- canonical pairs + candidate generation (M10/J2) ---------------
        "j2_block_candidates": _q_block_candidates,
        # --- pairwise features (F1/F4) -------------------------------------
        "f_pair_sims": _q_pair_sims,
        # --- sorts / top-k (O1/O3) -----------------------------------------
        "o1_topk_docs": _q_topk_docs,
        "o2_topk_per_lang": _q_topk_per_lang,
        # --- exact distributed quantiles (histogram pre-aggregate) ---------
        "a5_quantiles_by_lang": _q_quantiles_by_lang,
        # --- connected components + cluster sizes (C4/C7/A5/O3) ------------
        "c4_connected_components": _q_connected_components,
        # --- windowed aggregate over the events stream table ---------------
        "w1_tumbling_window": _q_tumbling_window,
        "w2_session_window": _q_session_window,
        "w3_asof_join": _q_asof_join,
        "w4_hopping_window": _q_hopping_window,
        "w5_running_sum": _q_running_sum,
        # --- ordered per-key aggregation + equal-frequency tiles -------------
        "w6_user_event_seq": _q_user_event_seq,
        "w7_value_quartile": _q_value_quartile,
        # --- distributed interval (range) join ------------------------------
        "rj_purchase_window": _q_interval_join,
        # --- mergeable-sketch approximate distinct (self-gated, no SQL oracle)
        "hll_distinct_users_by_type": _q_hll_distinct_users,
        # --- exact heavy hitters via Misra-Gries sketch + recheck ----------
        "hh_frequent_tokens": _q_heavy_hitters,
        # --- bottom-k-sample approximate quantiles (self-gated, no oracle) --
        "approx_quantiles_by_type": _q_approx_quantiles,
        # --- Bloom-prefiltered semi join (shuffle-volume reducer) -----------
        "j5_bloom_semi_revenue": _q_bloom_semi_revenue,
        # --- dedup ---------------------------------------------------------
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        # --- exact substring dedup (rolling-hash windows, content-defined) --
        "dedup_substring": _q_substring_pairs,
        "dedup_substring_clusters": _q_substring_clusters,
        # --- exact set-similarity self-join (prefix filter, PPJoin-style) --
        "sj_bigram_join": _q_set_similarity_join,
        # embedding near-dup has no queries() entry ON PURPOSE: hyperplane-LSH
        # recall is probabilistic (no exact SQL oracle can exist) AND the
        # synthetic embeddings tables contain zero pairs above any near-dup
        # threshold (max pair cosine ≈ 0.51 at sf0.001/sf0.01), so a driver
        # run would be a vacuous 0-row check. The operator is gated by
        # tests/test_dedup.py on synthetic near-duplicate vectors instead.
        # --- similarity search ---------------------------------------------
        "knn_cosine_topk": _q_knn_cosine,
        "ann_ivf_topk": _q_ann_ivf,
        # --- multimodal: real PPM decode → integer pixel stats (exact oracle)
        "mm_image_pixel_stats": _q_image_pixel_stats,
        # --- distributed k-means: seeded assignment step (exact SQL oracle) -
        "km_assign_cells": _q_kmeans_assign,
        # --- C8 cluster re-wiring (vectorized chain/star, exact SQL oracle) -
        "g1_cluster_chain_edges": _q_cluster_chain_edges,
        "g2_cluster_star_edges": _q_cluster_star_edges,
        "g3_edges_from_predictions": _q_edges_from_predictions,
        # --- SemDeDup semantic near-dedup (iterated k-means → rows-only,
        #     self-gated on an exact driver-side re-derivation) --------------
        "semdedup_keep": _q_semdedup,
        # --- text analysis -------------------------------------------------
        "text_quality": _q_text_quality,
        "token_counts": _q_token_counts,
        "fingerprint_md5": _q_fingerprint,
        "lang_id": _q_lang_id,                      # heuristic → no SQL oracle
        # --- curation ------------------------------------------------------
        "cur_stratified_sample": _q_stratified_sample,
        "cur_canonical_docs": _q_canonical_docs,
        "cur_lang_rollup": _q_lang_rollup,
        "cur_decontaminate": _q_decontaminate,
        # --- DSIR hashed n-gram importance weighting (exact SQL oracle) -----
        "cur_dsir_scores": _q_dsir_scores,
        "cur_redact_pii": _q_redact_pii,
        "cur_quality_gopher": _q_quality_gopher,
        "cur_remove_boilerplate": _q_remove_boilerplate,
        # --- training-sequence packing (greedy FFD, no SQL analogue) --------
        "cur_pack_sequences": _q_pack_sequences,
        "cur_chunk_pack": _q_chunk_pack,
        # --- distributed BPE vocabulary training (iterative → rows-only,
        #     self-gated on the single-process Sennrich reference) -----------
        "bpe_vocab_merges": _q_bpe_vocab,
        # --- per-key z-score normalization (two-pass broadcast) -------------
        "cur_zscore_by_type": _q_zscore_by_type,
        # --- deterministic hash-based train/val/test split -------------------
        "cur_train_split": _q_train_split,
        # --- overlapping word-window chunking (RAG / context prep) ----------
        "cur_chunk_documents": _q_chunk_documents,
        # --- the full ER pipeline (classifier → no SQL oracle) -------------
        "er_clusters": _q_er_clusters,
    }


def _q_filter_project(sf_dir: str):
    ds = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["l_quantity"], 30.0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.map_batches(
        lambda t: t.append_column(
            "revenue",
            pc.round(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])), 4),
        ).select(["l_orderkey", "l_quantity", "revenue"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _q_token_df(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def distinct_tokens(t: pa.Table) -> pa.Table:
        from entity_resolution__ray.functions.text_norm import distinct_tokens_flat

        return pa.table({"token": distinct_tokens_flat(tokens_array(t["text"]))})

    return ds.map_batches(distinct_tokens, batch_format="pyarrow").groupby("token").aggregate(
        Count(alias_name="df")
    )


def _q_revenue_by_nation(sf_dir: str):
    """Fact-table scan + BROADCAST dimension join (customer⋈nation is tiny and
    built once, shipped by ray.put) + per-batch partial aggregation — the
    star-schema join shape that avoids any all-to-all on the fact table. The
    final groupby moves only (nations × blocks) partial rows.

    o_totalprice is 2-decimal currency: summed as exact integer cents so the
    result is independent of partitioning/summation order."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = pa.concat_tables(
        list(_t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    nation = pa.concat_tables(
        list(_t(sf_dir, "nation", columns=["n_nationkey", "n_name"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    nname = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    import pandas as pd

    cust_index = pd.Index(cust["c_custkey"].to_numpy(zero_copy_only=False))
    cust_names = np.array(
        [nname[nk] for nk in cust["c_nationkey"].to_pylist()], dtype=object
    )  # one pass over the (tiny) dimension, not per fact row
    dim_ref = ray.put((cust_index, cust_names))

    def partial(t: pa.Table, dim_ref=dim_ref) -> pa.Table:
        from entity_resolution__ray.state.worker_cache import cached_get

        idx, names_arr = cached_get(dim_ref)
        import pandas as pd

        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), 0), pa.int64()).to_numpy()
        pos = idx.get_indexer(t["o_custkey"].to_numpy(zero_copy_only=False))
        names = names_arr[np.maximum(pos, 0)]
        names[pos < 0] = None
        df = pd.DataFrame({"n_name": names, "cents": cents})
        out = df.groupby("n_name", as_index=False).agg(cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby("n_name").aggregate(
        Sum("cents", alias_name="cents"), Sum("n_orders", alias_name="n_orders")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "total_price": pc.round(pc.divide(pc.cast(t["cents"], pa.float64()), 100.0), 2),
                "n_orders": t["n_orders"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_orders_by_customer(sf_dir: str):
    from entity_resolution__ray.stages.blocking import bucketed_apply

    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def agg(g):
        g = g.assign(cents=(g["o_totalprice"] * 100).round().astype("int64"))
        out = g.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            cents=("cents", "sum"),
            max_price=("o_totalprice", "max"),
        )
        out["sum_price"] = (out["cents"] / 100.0).round(2)
        return out[["o_custkey", "n_orders", "sum_price", "max_price"]]

    return bucketed_apply(orders, ["o_custkey"], agg, num_buckets=32)


def _q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) over lineitem
    (stages/rollup.rollup_aggregate): one vectorized finest-grain partial
    aggregation over the fact rows, then tiny re-aggregation shuffles per
    rollup level. Metrics are exact integers end to end — quantity as int64
    units, revenue as extendedprice-cents × (1-discount)-percent (1e-4 units,
    both 2-decimal in TPC-H) — so sums are independent of block boundaries;
    the final /10000.0 is one deterministic IEEE division on both sides."""
    from entity_resolution__ray.stages.rollup import rollup_aggregate

    li = _t(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        # floor(x + 0.5): identical half-away-from-zero tie rule on both sides
        # for the non-negative TPC-H amounts (pc.round is half-to-even while
        # DuckDB round() is half-away — structurally divergent on exact .5s).
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64()
        )
        disc = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(pc.subtract(pa.scalar(1.0), t["l_discount"]), 100.0), 0.5
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "rev4": pc.multiply(cents, disc),
            }
        )

    rolled = rollup_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_returnflag", "l_linestatus"],
        sum_int_cols=["qty", "rev4"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["qty"],
                "revenue": pc.divide(pc.cast(t["rev4"], pa.float64()), 10000.0),
                "n_rows": t["n_rows"],
            }
        )

    return rolled.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_pivot_lineitem(sf_dir: str):
    """PIVOT quantity by linestatus (stages/rollup.pivot_sum): one vectorized
    partial per batch over the fact rows, one tiny row-key reduce; explicit
    column domain ('F','O') — the distributed-pivot contract."""
    from entity_resolution__ray.stages.rollup import pivot_sum

    li = _t(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    prep = li.map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pivot_sum(prep, "l_returnflag", "l_linestatus", "qty", ["F", "O"])


def _first_token_keys(t: pa.Table) -> pa.Table:
    toks = tokens_array(t["text"])
    first = pc.binary_join(pc.list_slice(toks, 0, 1), "")  # [] → ""
    return pa.table({"doc_id": t["doc_id"], "k": first})


def _q_block_candidates(sf_dir: str):
    import pandas as pd

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    keyed = ds.map_batches(_first_token_keys, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.not_equal(t["k"], "")), batch_format="pyarrow"
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_left": pd.Series(dtype=np.int64), "id_right": pd.Series(dtype=np.int64),
                 "block_key": pd.Series(dtype=object)}
            )
        ii, jj = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_left": ids[ii], "id_right": ids[jj], "block_key": g["k"].iloc[0]})

    return keyed.groupby("k").map_groups(emit, batch_format="pandas")


def _q_pair_sims(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    left = ds.rename_columns({"doc_id": "id_left", "text": "src_text"})
    right = ds.map_batches(
        lambda t: pa.table({"id_left": pc.subtract(t["doc_id"], 1), "cand_text": t["text"]}),
        batch_format="pyarrow",
    )
    pairs = hash_join(left, right, on=["id_left"], num_partitions=8)

    def feats(t: pa.Table) -> pa.Table:
        a = [x or "" for x in t["src_text"].to_pylist()]
        b = [x or "" for x in t["cand_text"].to_pylist()]
        jw = np.round(strsim.jaro_winkler_batch(a, b), 6)
        ja = np.round(
            strsim.jaccard_batch([set(x.split()) for x in a], [set(x.split()) for x in b]), 6
        )
        return pa.table(
            {
                "id_left": t["id_left"],
                "jaro_winkler": pa.array(jw, type=pa.float64()),
                "token_jaccard": pa.array(ja, type=pa.float64()),
            }
        )

    return pairs.map_batches(feats, batch_format="pyarrow")


def _q_topk_docs(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def _q_connected_components(sf_dir: str):
    """Chain edges within each source group → distributed CC. Oracle: each
    source group is one component labelled by its min doc_id."""
    import pandas as pd

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = [str(x) for x in sorted(g["doc_id"].tolist())]
        if len(ids) < 2:
            return pd.DataFrame({"id_left": pd.Series(dtype=object), "id_right": pd.Series(dtype=object)})
        return pd.DataFrame({"id_left": ids[:-1], "id_right": ids[1:]})

    edges = ds.groupby("source").map_groups(chain, batch_format="pandas")
    out = cc_clusters(edges, num_partitions=8, renumber="dense")
    return out


def _q_cluster_chain_edges(sf_dir: str):
    """C8 chain re-wiring (stages/clustering.cluster_graph_edges, vectorized
    round 5): each source group re-wired as a chain over its lexically
    sorted string member ids, weight 1.0. Oracle: LAG window per source."""
    from entity_resolution__ray.stages.clustering import cluster_graph_edges

    ds = _docs(sf_dir, columns=["doc_id", "source"]).map_batches(
        lambda t: pa.table({"node_id": pc.cast(t["doc_id"], pa.string()),
                            "cluster_id": t["source"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return cluster_graph_edges(ds, "chain")


def _q_cluster_star_edges(sf_dir: str):
    """C8 star re-wiring: min-member hub per source group. Oracle: window
    min per source, one spoke per non-hub member."""
    from entity_resolution__ray.stages.clustering import cluster_graph_edges

    ds = _docs(sf_dir, columns=["doc_id", "source"]).map_batches(
        lambda t: pa.table({"node_id": pc.cast(t["doc_id"], pa.string()),
                            "cluster_id": t["source"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return cluster_graph_edges(ds, "star")


def _q_edges_from_predictions(sf_dir: str):
    """C6 graph-from-predictions (stages/clustering.edges_from_predictions):
    thresholded, self-loop-free, keep-max-weight edge build — the
    reference's nx.Graph construction as a composition. Input: two
    deterministic scored rows per doc over the same (src, dst) key with
    probs k/128 (exact binary fractions — no cross-engine rounding
    surface), so the keep-max actually resolves duplicates."""
    from entity_resolution__ray.stages.clustering import edges_from_predictions

    docs = _docs(sf_dir, columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = d * 7 + 3
        p1 = (d % 97) / 128.0
        p2 = (d % 53) / 128.0
        return pa.table({
            "id_left": pa.array(np.concatenate([d, d])),
            "id_right": pa.array(np.concatenate([dst, dst])),
            "prob_match": pa.array(np.concatenate([p1, p2])),
        })

    pairs = docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return edges_from_predictions(pairs, keep_threshold=0.45)


def _q_tumbling_window(sf_dir: str):
    from entity_resolution__ray.stages.blocking import bucketed_apply

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)  # µs → s
        win = pc.multiply(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), 60.0)), 60.0)
        return t.append_column("window_start", pc.cast(win, pa.int64())).drop_columns(["ts"])

    windowed = ev.map_batches(add_window, batch_format="pyarrow")

    def agg(g):
        g = g.assign(cents=(g["value"] * 100).round().astype("int64"))  # value is 2-decimal
        out = g.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("value", "size"), cents=("cents", "sum")
        )
        out["sum_value"] = (out["cents"] / 100.0).round(4)
        return out[["user_id", "window_start", "n_events", "sum_value"]]

    return bucketed_apply(windowed, ["user_id", "window_start"], agg, num_buckets=32)


def _q_stratified_sample(sf_dir: str):
    from entity_resolution__ray.stages.curation import stratified_sample

    ds = _t(sf_dir, "documents", columns=["doc_id", "source"])
    return stratified_sample(ds, key_col="source", n_per_key=25)


def _q_canonical_docs(sf_dir: str):
    from entity_resolution__ray.stages.curation import canonical_docs

    ds = _t(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return canonical_docs(ds).select_columns(["doc_id"])


def _q_lang_rollup(sf_dir: str):
    from entity_resolution__ray.stages.curation import group_rollup

    ds = _t(sf_dir, "documents", columns=["lang", "text", "n_chars"])
    return group_rollup(ds, key_col="lang")


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs sharing any token 3-gram with the
    deterministic "benchmark" subset (doc_id % 50 == 0) are flagged. The
    benchmark gram set is broadcast (one ray.put); the corpus streams through
    a hash-prefilter + exact-confirm probe (stages/decontaminate.py). n=3
    keeps the SQL oracle exact on the short synthetic texts; the production
    default is n=13."""
    from entity_resolution__ray.stages.decontaminate import (
        collect_benchmark_grams,
        decontaminate,
    )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    bench = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    grams = collect_benchmark_grams(bench, n=3)
    return decontaminate(docs, grams, n=3).select_columns(["doc_id", "contaminated"])


def _q_dsir_scores(sf_dir: str):
    """DSIR importance weighting (stages/dsir.dsir_weights): target = the
    deterministic benchmark subset (doc_id % 50 == 0, as in cur_decontaminate),
    source = the corpus; unigram+bigram features hashed into 8191 md5-prefix
    buckets; per-bucket log-ratios INTEGER-quantized (floor log2) so the
    per-doc sums are order-independent and the SQL oracle matches exactly
    (see stages/dsir.py on the quantization trade-off)."""
    from entity_resolution__ray.stages.dsir import dsir_weights

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    target = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return dsir_weights(docs, target, n_buckets=8191, quantize=True)


def _q_redact_pii(sf_dir: str):
    """PII redaction over the documents table, with deterministic PII
    injection first (the synthetic corpus contains none) so the redaction
    kernel does real work: every doc gains an email + an IPv4 derived from
    doc_id; every 5th a card number; every 7th a phone. The identical
    injection expression runs in the SQL oracle, and the patterns themselves
    come from ONE module constant (stages/pii.py REDACTIONS) rendered into
    SQL by oracle_redact_sql — kernel and oracle cannot drift."""
    from entity_resolution__ray.stages.pii import redact_pii

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks()
        s = pc.cast(did, pa.string())
        mod5 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 5), 5)), pa.int64())
        mod7 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 7), 7)), pa.int64())
        card = pc.if_else(pc.equal(mod5, 0), " card 4111 1111 1111 1111", "")
        phone = pc.if_else(pc.equal(mod7, 0), " tel +1 415 555 0199", "")
        mod200 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 200), 200)), pa.string())
        mod250 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 250), 250)), pa.string())
        aug = pc.binary_join_element_wise(
            pc.fill_null(t["text"].combine_chunks(), ""),
            " contact user", s, "@mail.example.com from 10.", mod200, ".0.", mod250,
            card, phone, "",
        )
        return t.set_column(t.schema.get_field_index("text"), "text", aug)

    injected = docs.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return redact_pii(injected).select_columns(
        ["doc_id", "text", "n_email", "n_card", "n_ip", "n_phone"]
    )


def _mod_col(did: pa.Array, k: int) -> pa.Array:
    """doc_id % k as an Arrow int64 column (pc.divide on ints truncates)."""
    return pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, k), k)), pa.int64())


_GOPHER_SPAM = " spam" * 9  # repeat(' spam', 9) — identical literal in the oracle


def _q_quality_gopher(sf_dir: str):
    """Gopher-style repetition/quality filter. The synthetic corpus has no
    line structure, so deterministic repetition is injected first (every 5th
    doc gains a duplicated promo line, every 7th a sponsor line, every 11th a
    9× repeated word) — the identical expression runs in the SQL oracle, the
    stats + keep flag come from stages/text_analysis.repetition_features."""
    from entity_resolution__ray.stages.text_analysis import repetition_filter

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks()
        p1 = pc.if_else(
            pc.equal(_mod_col(did, 5), 0),
            "\npromo offer click here now\npromo offer click here now", "",
        )
        p2 = pc.if_else(pc.equal(_mod_col(did, 7), 0), "\nvisit our sponsor page", "")
        p3 = pc.if_else(pc.equal(_mod_col(did, 11), 0), _GOPHER_SPAM, "")
        aug = pc.binary_join_element_wise(
            pc.fill_null(t["text"].combine_chunks(), ""), p1, p2, p3, ""
        )
        return t.set_column(t.schema.get_field_index("text"), "text", aug)

    injected = docs.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return repetition_filter(injected).select_columns(
        ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
         "top_word_frac", "mean_word_len", "keep"]
    )


def _q_remove_boilerplate(sf_dir: str):
    """Corpus-global boilerplate-line removal (C4/CCNet pass). Injection gives
    every doc a per-doc footer (df=1, must survive), ~half a newsletter line
    and a third one of three copyright variants (df ≫ min_df, must be
    removed); the identical expression runs in the SQL oracle."""
    from entity_resolution__ray.stages.curation import remove_boilerplate

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks()
        head1 = pc.if_else(pc.equal(_mod_col(did, 2), 0), "subscribe to our newsletter\n", "")
        head2 = pc.binary_join_element_wise(
            "copyright ", pc.cast(_mod_col(did, 3), pa.string()), " example corp\n", ""
        )
        tail = pc.binary_join_element_wise("\ndoc footer ", pc.cast(did, pa.string()), "")
        aug = pc.binary_join_element_wise(
            head1, head2, pc.fill_null(t["text"].combine_chunks(), ""), tail, ""
        )
        return t.set_column(t.schema.get_field_index("text"), "text", aug)

    injected = docs.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return remove_boilerplate(injected, min_df=10).select_columns(
        ["doc_id", "text", "n_removed"]
    )


def _q_session_window(sf_dir: str):
    from entity_resolution__ray.stages.windows import session_windows

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return session_windows(ev, gap_us=1_800_000_000)


def _q_topk_per_lang(sf_dir: str):
    """Grouped top-k (the row_number window pattern): 3 longest docs per
    language, ties broken by lowest doc_id."""
    from entity_resolution__ray.stages.curation import grouped_topk

    docs = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    return grouped_topk(docs, key_col="lang", sort_col="n_chars", k=3)


def _q_quantiles_by_lang(sf_dir: str):
    """Exact per-language length quantiles via the histogram pre-aggregate
    (stages/curation.grouped_quantiles) — quantile_disc parity."""
    from entity_resolution__ray.stages.curation import grouped_quantiles

    docs = _docs(sf_dir, columns=["lang", "n_chars"])
    return grouped_quantiles(docs, key_col="lang", value_col="n_chars")


def _q_asof_join(sf_dir: str):
    """Temporal as-of join: every purchase matched to the user's most recent
    view at-or-before it (stages/windows.asof_join_prior — one hash shuffle
    on user_id, pd.merge_asof galloping merge per bucket). Unmatched rows are
    filled with -1 sentinels HERE (not in the operator) so the hash compare
    never sees nullable-int NaN semantics; the oracle coalesces identically."""
    from entity_resolution__ray.stages.windows import asof_join_prior

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    out = asof_join_prior(ev, left_type="purchase", right_type="view")

    def sentinel(t: pa.Table) -> pa.Table:
        for c in ("prior_event_id", "prior_ts_us"):
            t = t.set_column(
                t.schema.get_field_index(c), c,
                pc.fill_null(pc.cast(t[c], pa.int64()), -1),
            )
        t = t.set_column(
            t.schema.get_field_index("prior_value"), "prior_value",
            pc.fill_null(t["prior_value"], -1.0),
        )
        # the pandas bucket kernel leaves pandas-dtype metadata ("Int64") on
        # the block schema; strip it so to_pandas yields plain numpy dtypes
        return t.replace_schema_metadata(None)

    return out.map_batches(sentinel, batch_format="pyarrow", zero_copy_batch=True)


def _q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type via the two-level
    pre-aggregated shuffle (stages/curation.grouped_distinct_count — batch
    combiner → (key,val) shuffle → partial sums; no sketch, no driver
    collect)."""
    from entity_resolution__ray.stages.curation import grouped_distinct_count

    ev = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_distinct_count(ev, key_col="event_type", val_col="user_id",
                                  out_col="n_users")


def _q_customers_no_urgent_order(sf_dir: str):
    """Customers who never placed a 1-URGENT order: distributed anti-join
    (stages/joins.distributed_anti_join — the beyond-broadcast J4: right
    keys are batch-deduped and hash-shuffled, one vectorized is_in per
    bucket, never collected to the driver)."""
    from entity_resolution__ray.stages.joins import distributed_anti_join

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])
    urgent = _t(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return distributed_anti_join(cust, urgent, on=["c_custkey"])


def _q_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 5-minute windows every 60s per
    event_type (stages/windows.hopping_windows — per-batch k-fold window
    replication collapsed by a partial aggregate BEFORE the shuffle)."""
    from entity_resolution__ray.stages.windows import hopping_windows

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "value"])
    return hopping_windows(ev, size_s=300, hop_s=60)


def _q_running_sum(sf_dir: str):
    """Per-user running sum over event time — the SUM() OVER (PARTITION BY
    user_id ORDER BY ts, event_id) window as one hash shuffle + vectorized
    segmented cumsum in scaled int64 (stages/intervals.running_aggregate)."""
    from entity_resolution__ray.stages.intervals import running_aggregate

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = running_aggregate(ev, key_col="user_id", ts_col="ts",
                            value_col="value", order_col="event_id")
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("running_sum"), "running_sum",
            pc.round(t["running_sum"], 4, round_mode="half_towards_infinity"),
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _q_user_event_seq(sf_dir: str):
    """Per-user time-ordered event-type sequence (curation.grouped_sequence)
    — the string_agg(ORDER BY) window shape that turns an event log into
    behavior strings for sequence training."""
    from entity_resolution__ray.stages.curation import grouped_sequence

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    return grouped_sequence(ev, "user_id", "event_type", ["ts", "event_id"])


def _q_value_quartile(sf_dir: str):
    """NTILE(4) per event_type over value (curation.grouped_ntile): one key
    shuffle, closed-form vectorized tile assignment with SQL's remainder
    rule."""
    from entity_resolution__ray.stages.curation import grouped_ntile

    ev = _t(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return grouped_ntile(ev, "event_type", "value", n=4, id_col="event_id")


def _q_interval_join(sf_dir: str):
    """Distributed interval join: each purchase anchors a [ts, ts+2h) window;
    all of the SAME user's events inside the window are matched (time-bin
    replicated intervals × single-bin points, lex-rank merge per bucket —
    stages/intervals.interval_join), then aggregated per anchor. Exact SQL
    oracle (BETWEEN join)."""
    from entity_resolution__ray.stages.blocking import bucketed_apply
    from entity_resolution__ray.stages.intervals import interval_join

    H2 = 2 * 3_600_000_000
    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])

    def to_intervals(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        ts = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "anchor_id": t["event_id"],
            "start_us": ts,
            "end_us": pc.add(ts, H2),
        })

    def to_points(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "value": t["value"],
        })

    pairs = interval_join(
        ev.map_batches(to_intervals, batch_format="pyarrow", zero_copy_batch=True),
        ev.map_batches(to_points, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", start_col="start_us", end_col="end_us", ts_col="ts_us",
        interval_cols=("anchor_id",), point_cols=("event_id", "value"),
        bin_us=3_600_000_000,
    )
    # drop the anchor matching itself, then aggregate per anchor (value is
    # 4-decimal → exact integer ten-thousandths)
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.not_equal(t["anchor_id"], t["event_id"])),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def agg(g: pa.Table) -> pa.Table:
        sc = pa.table({
            "anchor_id": g["anchor_id"],
            "__t": pc.cast(pc.round(pc.multiply(g["value"], 10_000.0), 0), pa.int64()),
        })
        out = sc.group_by(["anchor_id"]).aggregate([("__t", "sum"), ("__t", "count")])
        return pa.table({
            "anchor_id": out["anchor_id"],
            "n_follow": out["__t_count"],
            "sum_value": pc.round(pc.divide(pc.cast(out["__t_sum"], pa.float64()), 10_000.0),
                                  4, round_mode="half_towards_infinity"),
        })

    return bucketed_apply(pairs, ["anchor_id"], agg, num_buckets=16,
                          batch_format="pyarrow")


def _q_hll_distinct_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type — HyperLogLog p=12
    partials merged in one tiny groupby (stages/sketches.hll_grouped_distinct;
    the fixed-size-sketch scale path beside the exact a6 shuffle). No SQL
    oracle CAN exist (the estimate is approximate by construction), so the
    query SELF-GATES like er_clusters: it computes the exact counts too
    (cheap at bench scale) and raises if any estimate drifts past the 5σ
    HLL error bound."""
    from entity_resolution__ray.stages.curation import grouped_distinct_count
    from entity_resolution__ray.stages.sketches import hll_grouped_distinct

    ev = _t(sf_dir, "events", columns=["event_type", "user_id"])
    est = hll_grouped_distinct(ev, "event_type", "user_id").to_pandas()
    exact = grouped_distinct_count(
        _t(sf_dir, "events", columns=["event_type", "user_id"]),
        key_col="event_type", val_col="user_id", out_col="n_exact",
    ).to_pandas()
    merged = est.merge(exact, on="event_type")
    rel = (merged["approx_distinct"] - merged["n_exact"]).abs() / merged["n_exact"]
    if (rel > 0.09).any():
        raise AssertionError(
            f"HLL estimate drifted past the error bound: {merged.to_dict('records')}")
    return est.sort_values("event_type").reset_index(drop=True)


def _q_pack_sequences(sf_dir: str):
    """Training-sequence packing (stages/packing.pack_sequences): docs packed
    into <=512-token sequences by per-bucket first-fit-decreasing; oversized
    docs are chunked so coverage is exact. Greedy packing is not relational →
    no SQL oracle; the query SELF-GATES on exact token conservation (packed
    total == corpus whitespace-token total) and the budget bound, raising on
    any violation. Sequence membership lists are sorted out of the output
    (the driver hashes scalar columns only)."""
    from entity_resolution__ray.stages.packing import pack_sequences

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    out = pack_sequences(docs, budget=512).materialize()

    packed_total = out.sum("total_tokens")
    budget_max = out.max("total_tokens")

    def tok_count(t: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(pc.fill_null(t["text"], ""))
        n = pc.list_value_length(pc.split_pattern_regex(txt, r"\s+"))
        n = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int32()), n)
        return pa.table({"n": pc.cast(n, pa.int64())})

    corpus_total = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        tok_count, batch_format="pyarrow", zero_copy_batch=True).sum("n")
    if packed_total != corpus_total or budget_max > 512:
        raise AssertionError(
            f"packing gate: packed={packed_total} corpus={corpus_total} "
            f"max_seq={budget_max}")
    return out.select_columns(["seq_id", "n_docs", "total_tokens"])


def _q_chunk_pack(sf_dir: str):
    """The composed chunk→pack prep path (stages/chunking.chunk_then_pack):
    documents chunked into 32-word windows (stride = width, non-overlapping)
    then FFD-packed into <=128-token sequences — chunking is a doc-local map,
    packing adds its one bucketed shuffle, composed as a single streaming
    Dataset. Greedy packing is not relational → no SQL oracle; SELF-GATED on
    exact token conservation ACROSS BOTH STAGES (Σ sequence tokens == corpus
    whitespace-word total — stride==width makes the identity exact) and the
    per-sequence budget bound, raising on any violation."""
    from entity_resolution__ray.stages.chunking import chunk_then_pack

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    out = chunk_then_pack(docs, chunk_words=32, budget=128).materialize()

    packed_total = out.sum("total_tokens")
    budget_max = out.max("total_tokens")

    def tok_count(t: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(pc.fill_null(t["text"], ""))
        n = pc.list_value_length(pc.split_pattern_regex(txt, r"\s+"))
        n = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int32()), n)
        return pa.table({"n": pc.cast(n, pa.int64())})

    corpus_total = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        tok_count, batch_format="pyarrow", zero_copy_batch=True).sum("n")
    if packed_total != corpus_total or budget_max > 128:
        raise AssertionError(
            f"chunk→pack gate: packed={packed_total} corpus={corpus_total} "
            f"max_seq={budget_max}")
    return out.select_columns(["seq_id", "n_docs", "total_tokens"])


def _q_zscore_by_type(sf_dir: str):
    """Per-event-type z-score of value (stages/curation.grouped_zscore):
    batch-combined (key, n, sum, sumsq) moments → one tiny keys-only shuffle
    → broadcast stats → vectorized transform. Rounded to 4 decimals for the
    stable float compare against the SQL window oracle."""
    from entity_resolution__ray.stages.curation import grouped_zscore

    ev = _t(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = grouped_zscore(ev, "event_type", "value", id_cols=("event_id",))
    return out.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "zscore": pc.round(t["zscore"], 4, round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _q_train_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id) prefix
    (stages/curation.train_split): shuffle-free, growth-stable (a doc's split
    never changes when the corpus grows — the property random seeds cannot
    give), and exactly replicable in SQL (same md5-prefix arithmetic)."""
    from entity_resolution__ray.stages.curation import train_split

    docs = _docs(sf_dir, columns=["doc_id"])
    return train_split(docs, id_col="doc_id")


def _q_chunk_documents(sf_dir: str):
    """Overlapping word-window chunking (stages/chunking.chunk_documents):
    32-word chunks, stride 24 (8-word overlap) — doc-local, one map_batches,
    no shuffle; fully vectorized gather over the flattened word array. The
    SQL oracle replicates the exact start grid with generate_series and list
    slicing."""
    from entity_resolution__ray.stages.chunking import chunk_documents

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_words=32, stride_words=24)


def _q_bpe_vocab(sf_dir: str):
    """Distributed BPE vocabulary training (stages/bpe.bpe_train): the corpus
    collapses to a distinct-word table once, then each merge round is a
    bounded pair-count shuffle + vectorized merge application. Iterative →
    no SQL oracle; SELF-GATED: the merge sequence must EQUAL the
    single-process Sennrich reference run on independently-derived (DuckDB)
    word counts — exact, not approximate. Gate is fixture-scale bounded and
    raises (never skips) above the cap."""
    import duckdb

    from entity_resolution__ray.stages.bpe import bpe_train, bpe_train_reference

    n_merges = 24
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    merges = bpe_train(docs, n_merges=n_merges)

    con = duckdb.connect()
    wc = con.execute(
        f"""
        SELECT w AS word, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
          FROM read_parquet('{os.path.join(sf_dir, "documents.parquet")}')
        ) GROUP BY w
        """
    ).fetchall()
    if len(wc) > 200_000:
        raise AssertionError("bpe self-gate is fixture-scale only; got %d words" % len(wc))
    want = bpe_train_reference(dict(wc), n_merges=n_merges)
    if merges != want:
        # default covers the strict-prefix case (equal common prefix,
        # different lengths), where the zip generator exhausts
        rank = next(
            (i for i, (g, w) in enumerate(zip(merges, want)) if g != w),
            min(len(merges), len(want)),
        )
        raise AssertionError(
            f"bpe_vocab_merges self-gate: distributed merges diverge from the "
            f"Sennrich reference at rank {rank} "
            f"(got {len(merges)} merges, want {len(want)})"
        )
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges]),
            "right": pa.array([b for _, b in merges]),
        }
    )


def _q_heavy_hitters(sf_dir: str):
    """Exact frequent tokens (count >= 0.5% of all token occurrences) via the
    two-pass Misra-Gries sketch + broadcast recheck
    (stages/sketches.heavy_hitters) — the sketch bounds what enters the
    shuffle at any vocabulary size; the recheck makes the output exact, so an
    exact SQL oracle exists despite the sketch."""
    from entity_resolution__ray.stages.sketches import heavy_hitters

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return heavy_hitters(docs, theta=0.005)


def _q_approx_quantiles(sf_dir: str):
    """Approximate per-event-type quantiles of value via deterministic
    bottom-k(id-hash) sampling (stages/sketches.approx_grouped_quantiles) —
    the continuous-domain scale path beside the exact histogram
    a5_quantiles_by_lang. Sampling is approximate by construction → no SQL
    equality oracle; the query SELF-GATES on rank error vs the exact sorted
    values (5σ binomial bound), raising on drift."""
    import duckdb

    from entity_resolution__ray.stages.sketches import approx_grouped_quantiles

    ev = _t(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = approx_grouped_quantiles(
        ev, "event_type", "value", "event_id", qs=(0.25, 0.5, 0.9), k=4096
    ).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet("
                f"'{os.path.join(sf_dir, 'events.parquet')}')")
    exact = con.execute(
        "SELECT event_type, value FROM events").fetchdf()
    for key, sub in exact.groupby("event_type"):
        vals = np.sort(sub["value"].to_numpy())
        for q in (0.25, 0.5, 0.9):
            est = float(out[(out["event_type"] == key) & (out["q"] == q)]["value"].iloc[0])
            rank = np.searchsorted(vals, est) / len(vals)
            k_eff = min(4096, len(vals))
            tol = 5 * np.sqrt(q * (1 - q) / k_eff) + 1e-3
            if abs(rank - q) > tol:
                raise AssertionError(
                    f"approx quantile drift: {key} q={q} rank={rank:.4f}")
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def _q_bloom_semi_revenue(sf_dir: str):
    """Per-order lineitem revenue restricted to 1-URGENT orders, computed as
    Bloom prefilter (stages/joins.build_bloom_filter — no false negatives, so
    the result is exact) → distributed semi join (removes Bloom false
    positives) → pre-aggregated grouped sum in integer cents. The Bloom pass
    drops non-matching probe rows BEFORE any shuffle — the classic join
    shuffle-volume reducer."""
    from entity_resolution__ray.stages.blocking import bucketed_apply
    from entity_resolution__ray.stages.joins import (
        bloom_prefilter, build_bloom_filter, distributed_anti_join)

    urgent = _t(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_orderkey"]).rename_columns(["l_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    bm = build_bloom_filter(urgent, on=["l_orderkey"], num_bits=1 << 20)
    pre = bloom_prefilter(li, bm, on=["l_orderkey"])
    matched = distributed_anti_join(pre, urgent, on=["l_orderkey"], semi=True)

    def agg(g: pa.Table) -> pa.Table:
        sc = pa.table({
            "l_orderkey": g["l_orderkey"],
            "__c": pc.cast(pc.round(pc.multiply(g["l_extendedprice"], 100.0), 0),
                           pa.int64()),
        })
        out = sc.group_by(["l_orderkey"]).aggregate([("__c", "sum")])
        return pa.table({
            "l_orderkey": out["l_orderkey"],
            "revenue": pc.round(pc.divide(pc.cast(out["__c_sum"], pa.float64()), 100.0),
                                2, round_mode="half_towards_infinity"),
        })

    return bucketed_apply(matched, ["l_orderkey"], agg, num_buckets=16,
                          batch_format="pyarrow")


def _q_substring_pairs(sf_dir: str):
    """Exact substring dedup (stages/substring_dedup.substring_dup_pairs):
    doc pairs sharing any 32-byte run, via vectorized rolling-hash window
    fingerprints (mod_p=1: every window, so the result equals true substring
    equality up to 64-bit collisions) and the LSH-style capped bucket pair
    emission. The oracle computes the same pairs by direct substring
    equality; the corpus is ASCII so byte and char windows coincide."""
    from entity_resolution__ray.stages.substring_dedup import substring_dup_pairs

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return substring_dup_pairs(docs, window=32, mod_p=1)  # default = full pair set


def _q_substring_clusters(sf_dir: str):
    """Substring-dup CC clusters (stages/substring_dedup.substring_dup_clusters):
    (doc_id, dup_group=min component id) over the shared-32-byte-run graph,
    with the round-5 ``max_group_size="auto"`` probe engaged end to end —
    the cap preserves group connectivity exactly, so the oracle's recursive
    transitive closure over the FULL pair set matches whether or not the
    probe decides to star-cap. Singleton docs keep themselves and are
    omitted (same contract as dedup_minhash_lsh)."""
    from entity_resolution__ray.stages.substring_dedup import substring_dup_clusters

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return substring_dup_clusters(docs, window=32, mod_p=1, max_group_size="auto")


def _q_set_similarity_join(sf_dir: str):
    """Exact word-bigram-set Jaccard self-join at t=0.4 over documents
    (stages/setsim.set_similarity_join): prefix-filter candidates (complete
    by the prefix theorem — no LSH recall caveat) verified against the
    broadcast pre-hashed gram store. Prefixes are ordered by ascending
    document frequency (the published PPJoin order, fitted distributed over
    the materialized gram sets) so corpus-hot tokens never enter a prefix.
    The oracle is the brute-force explode-join-group in SQL; at this
    threshold the join recovers exactly the corpus's planted near-duplicate
    pairs."""
    from entity_resolution__ray.stages.setsim import set_similarity_join

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return set_similarity_join(docs, threshold=0.4, shingle="word2")


def _q_dedup_exact(sf_dir: str):
    return exact_dedup(_docs(sf_dir, columns=["doc_id", "text"])).select_columns(["doc_id"])


def _q_dedup_minhash(sf_dir: str):
    # GRAFT_ER_FORCE_SCALE_PATHS=1 → verify via the beyond-object-store join
    # path (texts ride with pairs) instead of the broadcast gram store; same
    # knob as _q_er_clusters, used by the scale-regime bench legs.
    attach = "join" if os.environ.get("GRAFT_ER_FORCE_SCALE_PATHS") == "1" else "auto"
    return minhash_lsh_dedup(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, attach_mode=attach
    )


def _q_dedup_simhash(sf_dir: str):
    # md5 token hashing → the DuckDB oracle recomputes identical signatures;
    # recall at Hamming ≤ 3 is exact (4×16-bit bands, pigeonhole), so the
    # output is the deterministic set of all ≤3-Hamming pairs.
    return simhash_candidates(_docs(sf_dir, columns=["doc_id", "text"]), max_hamming=3, hash_mode="md5")


def _q_ngram_jaccard(sf_dir: str):
    """Char-4-gram Jaccard verification over a deterministic pair set
    (adjacent doc ids — the f_pair_sims shape), via the JOIN-path verifier
    ``dedup.JaccardVerify`` — the text-riding verify kernel the
    beyond-object-store dedup path uses. Exact SQL oracle (same grams CTE as
    the minhash closure oracle)."""
    from entity_resolution__ray.stages.dedup import JaccardVerify

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    left = ds.rename_columns({"doc_id": "id_left", "text": "src_text"})
    right = ds.map_batches(
        lambda t: pa.table({"id_left": pc.subtract(t["doc_id"], 1), "cand_text": t["text"]}),
        batch_format="pyarrow",
    )
    pairs = hash_join(left, right, on=["id_left"], num_partitions=8)
    v = JaccardVerify(shingle="char4")
    # round_mode matches DuckDB ROUND (half away from zero = towards_infinity);
    # half-to-even diverges on exact ties like 0.2578125
    return pairs.map_batches(lambda t, vv=v: vv(t), batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "id_left": t["id_left"],
            "jaccard": pc.round(t["jaccard"], 6, round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )


def _q_knn_cosine(sf_dir: str):
    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrows = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .take_all()
    )
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    out = brute_force_topk(emb, Q, k=10)
    return out.set_column(
        out.column_names.index("cosine"), "cosine", pc.round(out["cosine"], 4)
    )


def _q_ann_ivf(sf_dir: str):
    """IVF ANN with nprobe == n_clusters: every cell is probed, so recall is
    EXACT and the result must hash-match the brute-force SQL oracle — this
    gates the whole IVF machinery (k-means fit, cell assignment, per-cell
    partial top-k, probe-mask merge) with a deterministic oracle."""
    from entity_resolution__ray.stages.similarity import ivf_build, ivf_topk

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrows = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 2")
        .take_all()
    )
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    assigned, centers = ivf_build(emb, n_clusters=8, vec_col="embedding", id_col="vec_id", seed=0)
    out = ivf_topk(assigned, centers, Q, k=5, nprobe=8)
    return out.set_column(
        out.column_names.index("cosine"), "cosine", pc.round(out["cosine"], 4)
    )


def _q_image_pixel_stats(sf_dir: str):
    """Multimodal decode path through the driver contract: every doc gets a
    REAL PPM(P6) image payload whose pixels come from a closed-form formula
    of doc_id — pixel(y,x,c) = (doc_id·7 + y·31 + x·13 + c·5) mod 256, with
    w = 4 + doc_id mod 5, h = 3 + doc_id mod 4 — encoded by the from-scratch
    codec, then decoded back by stages/multimodal.image_pixel_stats. The
    DuckDB oracle recomputes width/height/pixel_sum symbolically from the
    same formula, so the encode→decode→stats path is hash-gated end to end."""
    from entity_resolution__ray.stages.multimodal import encode_ppm, image_pixel_stats

    docs = _docs(sf_dir, columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in dids:
            w, h = int(4 + d % 5), int(3 + d % 4)
            y, x, c = np.ogrid[0:h, 0:w, 0:3]
            px = ((int(d) * 7 + y * 31 + x * 13 + c * 5) % 256).astype(np.uint8)
            payloads.append(encode_ppm(px))
        return pa.table({"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())})

    media = docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return image_pixel_stats(media, id_col="doc_id")


def _q_kmeans_assign(sf_dir: str):
    """One Lloyd assignment step with the deterministic seed centroids (the
    vectors of the 8 smallest vec_ids — stages/kmeans seed init): centroids
    broadcast once, argmin per batch in float64, ties to the lowest cell id.
    Exactly replicable in SQL (list_distance + row_number), which oracle-gates
    the distributed k-means machinery's assignment kernel and seed path."""
    from entity_resolution__ray.stages.kmeans import _bottom_k_rows, kmeans_assign

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    C = _bottom_k_rows(emb, "vec_id", "embedding", k=8)
    return kmeans_assign(emb, C)


def _q_semdedup(sf_dir: str):
    """SemDeDup semantic near-dedup (stages/kmeans.semdedup): distributed
    k-means cells, then within-cell greedy cosine pruning (keep the lowest
    id of any group with cosine ≥ threshold). The synthetic embeddings have
    no true near-dups (max pair cosine ≈ 0.51), so the query runs at an
    aggressive diversity-pruning threshold of 0.4 to exercise real drops.
    Iterated k-means has no SQL analogue → rows-only; SELF-GATED here: the
    kept/dropped partition is re-derived exactly by a driver-side reference
    on the collected vectors (bounded — raises above the cap rather than
    silently skipping)."""
    from entity_resolution__ray.stages.kmeans import semdedup

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    k, n_iters, threshold = 4, 3, 0.4
    # Gate cap == max_cell (pinned explicitly): the reference re-derivation
    # below groups by `cell` ONLY, while the engine splits cells larger than
    # max_cell into __sub sub-cells with their own greedy passes — so the
    # gate is exact precisely when no split can occur, i.e. every cell
    # (≤ total rows ≤ cap) stays within max_cell. A larger advertised cap
    # with the default max_cell=4096 silently diverged past ~16k rows.
    GATE_CAP = 4096
    out = semdedup(emb, k=k, n_iters=n_iters, threshold=threshold,
                   max_cell=GATE_CAP).to_pandas()

    n = len(out)
    if n > GATE_CAP:
        raise AssertionError("semdedup self-gate is fixture-scale only; got %d rows" % n)
    # ---- exact reference re-derivation (same cells, same greedy rule) -----
    import pandas as pd

    vec_df = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    X = np.stack(vec_df.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    ids = vec_df.sort_values("vec_id")["vec_id"].to_numpy()
    got = out.sort_values("vec_id").reset_index(drop=True)
    assert (got["vec_id"].to_numpy() == ids).all(), "row set drifted"
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    for cell, grp in got.groupby("cell"):
        idx = grp.index.to_numpy()
        S = Xn[idx] @ Xn[idx].T
        kept: list = []
        for j in range(len(idx)):
            if kept and np.max(S[kept, j]) >= threshold:
                want_keep = 0
            else:
                want_keep = 1
                kept.append(j)
            assert int(grp["keep"].iloc[j]) == want_keep, (
                f"semdedup self-gate: cell {cell} row {ids[idx[j]]} keep mismatch"
            )
    return out


def _q_text_quality(sf_dir: str):
    out = quality_score(_docs(sf_dir, columns=["doc_id", "text"]))
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "punct_ratio": pc.round(t["punct_ratio"], 6),
                "stop_ratio": pc.round(t["stop_ratio"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def _q_token_counts(sf_dir: str):
    return token_counts(_docs(sf_dir, columns=["doc_id", "text"])).select_columns(
        ["doc_id", "ws_tokens", "bpe_tokens"]
    )


def _q_fingerprint(sf_dir: str):
    return fingerprints(_docs(sf_dir, columns=["doc_id", "text"])).select_columns(["doc_id", "md5_fp"])


def _q_lang_id(sf_dir: str):
    return language_id(_docs(sf_dir, columns=["doc_id", "text"])).select_columns(["doc_id", "lang_pred"])


_ER_GATE_OK = False


def _er_fixture_gate() -> None:
    """Deterministic correctness gate for the (non-SQL-expressible)
    er_clusters query: run the full pipeline on the committed fixture corpus
    (testgen, fixed seed — a corpus with KNOWN entity clusters) and require

      1. the produced cluster partition to EQUAL the committed golden
         (entity_resolution__ray/golden/er_clusters_fixture_partition.json,
         regenerated only by scripts/regen_golden.py; verified stable across
         shuffle widths), and
      2. pairwise F1 ≥ 0.97 on the generator's labeled pairs at matched
         blocking keys (the BASELINE.md metric — per-pair, before transitive
         amplification of clone-entity merges).

    Raises on any drift, so the driver's rows-only CORRECTNESS check on
    er_clusters actually gates pipeline semantics instead of trusting pytest.
    Runs once per process; bench.py triggers it in the untimed warm-up."""
    global _ER_GATE_OK
    if _ER_GATE_OK:
        return
    import json

    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.testgen import generate_corpus

    docs_tbl, _, golden_pairs = generate_corpus(n_entities=60, seed=1234)
    out = run_er_pipeline(
        rd.from_arrow(docs_tbl), model=_fixture_trained_model(), workdir=None,
        config=ERConfig(
            num_partitions=8, use_geo=False, run_cohort_transitivity=False,
            per_doc_topk=40, max_group_size=256, cc_driver_fallback=100_000,
            lazy_stages=True,
        ),
    )
    got: dict = {}
    for r in out["clusters_cc"].take_all():
        got.setdefault(r["cluster_id"], []).append(str(r["node_id"]))
    got_partition = sorted(sorted(m) for m in got.values())
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "entity_resolution__ray", "golden", "er_clusters_fixture_partition.json",
    )
    with open(path) as f:
        want = json.load(f)
    if got_partition != want["partition"]:
        raise RuntimeError(
            "er_clusters fixture gate FAILED: cluster partition drifted from the "
            f"committed golden ({len(got_partition)} vs {len(want['partition'])} clusters). "
            "If the change is intentional, regenerate with scripts/regen_golden.py."
        )
    # pairwise F1 on labeled pairs at matched blocking keys (BASELINE metric)
    from entity_resolution__ray.pipelines.er_pipeline import evaluate_pairwise_f1

    m = evaluate_pairwise_f1(out["edges"], golden_pairs, out["candidate_pairs"])
    if m["f1"] < 0.97:
        raise RuntimeError(
            f"er_clusters fixture gate FAILED: pairwise F1 {m['f1']:.4f} < 0.97 ({m})"
        )
    _ER_GATE_OK = True


def _q_er_clusters(sf_dir: str):
    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.sources.docs import read_flat_documents_as_docs

    _er_fixture_gate()
    # GRAFT_ER_FORCE_SCALE_PATHS=1 shrinks the probe budget to ~0 so the
    # sizing probe selects the beyond-object-store paths (features_mode=texts,
    # attach_mode=join, renumber=hash) even on a corpus that would fit a
    # broadcast — used by the scale-regime bench legs to exercise the
    # 100-TB path end-to-end on real data (BASELINE.md "join-mode at 500k").
    force_scale = os.environ.get("GRAFT_ER_FORCE_SCALE_PATHS") == "1"
    out = run_er_pipeline(
        read_flat_documents_as_docs(sf_dir), model=_fixture_trained_model(), workdir=None,
        config=ERConfig(
            num_partitions=16, use_geo=False, run_cohort_transitivity=False,
            per_doc_topk=40, max_group_size=256,  # the reference's k=40 blocking fan-out
            cc_driver_fallback=100_000,
            # single-consumer stages stay lazy → one fused streaming execution
            # (no per-stage materialize barriers); checkpointed runs still
            # materialize every stage
            lazy_stages=True,
            broadcast_max_fraction=1e-9 if force_scale else 0.25,
            dense_renumber_max_rows=0 if force_scale else 50_000_000,
        ),
    )
    return out["clusters_cc"]


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; tables pre-registered as views)
# ---------------------------------------------------------------------------
def _lang_id_oracle_sql() -> str:
    """SQL replica of stages.text_analysis.LanguageId, built from the SAME
    ``_LANG_PROFILES`` dict so the two can never drift: CJK chars → 'zh';
    otherwise argmax of per-language function-word occurrence counts over
    ``[a-zA-Z']+`` tokens, ties → earliest profile in insertion order,
    zero hits → 'und'."""
    rows = []
    for ord_, (lang, prof) in enumerate(_LANG_PROFILES.items()):
        for w in sorted(prof):
            rows.append(f"('{lang}', '{w}', {ord_})")
    values = ", ".join(rows)
    return f"""
        WITH docs AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        profiles(lang, w, ord) AS (VALUES {values}),
        toks AS (
            SELECT doc_id, lower(unnest(regexp_extract_all(text, '[a-zA-Z'']+'))) AS w
            FROM docs
        ),
        scores AS (
            SELECT t.doc_id, p.lang, p.ord, count(*) AS s
            FROM toks t JOIN profiles p ON t.w = p.w
            GROUP BY 1, 2, 3
        ),
        best AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, ord ASC) AS rn
            FROM scores
        )
        SELECT d.doc_id,
               CASE WHEN regexp_matches(d.text, '[一-鿿぀-ヿ]') THEN 'zh'
                    WHEN b.lang IS NOT NULL THEN b.lang
                    ELSE 'und' END AS lang_pred
        FROM docs d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """


def _redact_pii_oracle_sql() -> str:
    """SQL replica of _q_redact_pii: identical deterministic injection, then
    the redaction expressions rendered from the SAME pattern table the Ray
    kernel uses (stages/pii.py oracle_redact_sql)."""
    from entity_resolution__ray.stages.pii import oracle_redact_sql

    inject = (
        "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)"
        " || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
        " || CASE WHEN doc_id % 5 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' tel +1 415 555 0199' ELSE '' END"
    )
    ex = oracle_redact_sql("aug")
    return f"""
        WITH injected AS (SELECT doc_id, {inject} AS aug FROM documents)
        SELECT doc_id, {ex['text']} AS text,
               {ex['n_email']} AS n_email, {ex['n_card']} AS n_card,
               {ex['n_ip']} AS n_ip, {ex['n_phone']} AS n_phone
        FROM injected
    """


def oracle_sql() -> dict[str, str]:
    return {
        "m8_filter_project": """
            SELECT l_orderkey, l_quantity,
                   round(l_extendedprice * (1 - l_discount), 4) AS revenue
            FROM lineitem WHERE l_quantity >= 30
        """,
        "a4_token_df": """
            SELECT token, count(*) AS df FROM (
              SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
              FROM documents
            ) GROUP BY token
        """,
        "j1_revenue_by_nation": """
            SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total_price, count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        # MinHash-LSH near-dedup: the LSH stage is a recall device; at the
        # verify threshold (exact char-4-gram jaccard >= 0.8) band collision
        # probability is ~1, so the output equals the transitive closure of
        # ALL >= 0.8 pairs — which SQL CAN compute exactly (grams -> pairwise
        # jaccard -> recursive-CTE closure, dup_group = min member id).
        "dedup_minhash_lsh": """
            WITH RECURSIVE docs AS (SELECT doc_id, coalesce(text,'') AS text FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN length(text) < 4 THEN text ELSE gram END AS g
              FROM (
                SELECT doc_id, text,
                       unnest(list_transform(range(1, greatest(length(text)-2, 2)),
                                             i -> substring(text, i, 4))) AS gram
                FROM docs WHERE length(text) > 0
              )
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT id1, id2 FROM inter
              JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
              WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.8
            ),
            edges AS (SELECT id1 AS u, id2 AS v FROM pairs UNION SELECT id2, id1 FROM pairs),
            walk(id, label) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.id WHERE w.label < e.v
            )
            SELECT id AS doc_id, min(label) AS dup_group FROM walk GROUP BY id
        """,
        # SimHash near-dedup: the Ray query hashes tokens with md5 (first 8
        # bytes, big-endian) so SQL can recompute the EXACT 64-bit signature
        # (bit b set iff >half the token occurrences have bit b of md5 set);
        # 4×16-bit banding has exact recall at Hamming ≤ 3 (pigeonhole), so
        # the output is precisely all pairs with bit_count(xor) <= 3.
        "dedup_simhash": r"""
            WITH docs AS (SELECT doc_id, coalesce(text,'') AS text FROM documents),
            toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              FROM docs WHERE trim(text) <> ''
            ),
            th AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
              FROM toks WHERE tok <> ''
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
            bits AS (
              SELECT t.doc_id, b.b, sum(((t.h >> b.b) & 1)::BIGINT) AS s
              FROM th t CROSS JOIN (SELECT unnest(range(64))::BIGINT AS b) b
              GROUP BY 1, 2
            ),
            sh AS (
              SELECT bb.doc_id,
                     bit_or(CASE WHEN 2*bb.s > c.n THEN (1::UBIGINT << bb.b::INTEGER)
                                 ELSE 0::UBIGINT END) AS sig
              FROM bits bb JOIN cnt c ON bb.doc_id = c.doc_id
              GROUP BY bb.doc_id
            ),
            allsig AS (
              SELECT d.doc_id, coalesce(sh.sig, 0::UBIGINT) AS sig
              FROM docs d LEFT JOIN sh ON d.doc_id = sh.doc_id
            )
            SELECT a.doc_id AS id_left, b.doc_id AS id_right,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
        """,
        # language ID: the heuristic is deterministic (profile argmax with
        # fixed tie order) so the SQL replica is exact — see _lang_id_oracle_sql
        "lang_id": _lang_id_oracle_sql(),
        "a2_orders_by_customer": """
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price,
                   max(o_totalprice) AS max_price
            FROM orders GROUP BY o_custkey
        """,
        # exact-integer metrics (see _q_rollup_lineitem): revenue summed in
        # 1e-4 currency units as integers, one final IEEE division — both
        # sides bit-identical regardless of partitioning / summation order.
        "a8_rollup_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                     / 10000.0 AS revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "a9_pivot_lineitem": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN l_linestatus = 'F'
                            THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS qty_F,
                   CAST(sum(CASE WHEN l_linestatus = 'O'
                            THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS qty_O,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "j2_block_candidates": """
            WITH keyed AS (
              SELECT doc_id, regexp_extract(lower(text), '[a-z0-9]+') AS k FROM documents
            )
            SELECT a.doc_id AS id_left, b.doc_id AS id_right, a.k AS block_key
            FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
            WHERE a.k <> ''
        """,
        "f_pair_sims": """
            WITH pairs AS (
              SELECT a.doc_id AS id_left, a.text AS ta, b.text AS tb
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            ),
            tok AS (
              SELECT id_left, ta, tb,
                     list_distinct(string_split_regex(trim(ta), '\\s+')) AS la,
                     list_distinct(string_split_regex(trim(tb), '\\s+')) AS lb
              FROM pairs
            )
            SELECT id_left,
                   round(jaro_winkler_similarity(ta, tb), 6) AS jaro_winkler,
                   round(CASE
                     WHEN len(la) = 0 AND len(lb) = 0 THEN 1.0
                     WHEN len(la) = 0 OR len(lb) = 0 THEN 0.0
                     ELSE len(list_intersect(la, lb)) * 1.0 / len(list_distinct(la || lb))
                   END, 6) AS token_jaccard
            FROM tok
        """,
        "o1_topk_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10
        """,
        "c4_connected_components": """
            WITH comp AS (
              SELECT doc_id, source,
                     min(doc_id) OVER (PARTITION BY source) AS root,
                     count(*) OVER (PARTITION BY source) AS csize
              FROM documents
            ),
            ranked AS (SELECT DISTINCT root FROM comp),
            ids AS (SELECT root, row_number() OVER (ORDER BY root) - 1 AS cluster_id FROM ranked)
            SELECT cast(c.doc_id AS VARCHAR) AS node_id, i.cluster_id, c.csize AS cluster_size
            FROM comp c JOIN ids i ON c.root = i.root
            WHERE c.csize >= 2
        """,
        # lexicographic string order on both sides (the engine sorts string
        # node ids; DuckDB ORDER BY on VARCHAR is the same byte order here)
        "g1_cluster_chain_edges": """
            WITH m AS (SELECT source, CAST(doc_id AS VARCHAR) AS n FROM documents),
            o AS (SELECT source, n,
                         lag(n) OVER (PARTITION BY source ORDER BY n) AS p
                  FROM m)
            SELECT p AS u, n AS v, 1.0 AS weight FROM o WHERE p IS NOT NULL
        """,
        "g2_cluster_star_edges": """
            WITH m AS (SELECT source, CAST(doc_id AS VARCHAR) AS n FROM documents),
            o AS (SELECT source, n, min(n) OVER (PARTITION BY source) AS hub FROM m)
            SELECT hub AS u, n AS v, 1.0 AS weight FROM o WHERE n <> hub
        """,
        # probs are k/128 (exact binary fractions) so no rounding surface
        "g3_edges_from_predictions": """
            WITH p AS (
              SELECT doc_id AS id_left, doc_id * 7 + 3 AS id_right,
                     (doc_id % 97) / 128.0 AS prob_match FROM documents
              UNION ALL
              SELECT doc_id, doc_id * 7 + 3, (doc_id % 53) / 128.0 FROM documents
            )
            SELECT id_left, id_right, max(prob_match) AS weight
            FROM p WHERE prob_match >= 0.45 AND id_left <> id_right
            GROUP BY id_left, id_right
        """,
        "cur_stratified_sample": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents
            ) WHERE rk <= 25
        """,
        "cur_canonical_docs": """
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents
            ) WHERE rk = 1
        """,
        "cur_lang_rollup": """
            SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
                   sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END)::BIGINT AS total_ws_tokens
            FROM documents GROUP BY lang
        """,
        "w2_session_window": """
            WITH e AS (
              SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value FROM events
            ), g AS (
              SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                             OR ts_us - lag(ts_us) OVER w > 1800000000
                             THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
            ), s AS (
              SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM g
            )
            SELECT user_id, session_id, min(ts_us) AS session_start_us,
                   max(ts_us) AS session_end_us, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, session_id
        """,
        "w1_tumbling_window": """
            SELECT user_id, (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "w6_user_event_seq": """
            SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
                   count(*) AS n_items
            FROM events GROUP BY user_id
        """,
        "w7_value_quartile": """
            SELECT event_type, event_id, value,
                   CAST(NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS tile
            FROM events
        """,
        "a6_distinct_users_by_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "j4_customers_no_urgent_order": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "w4_hopping_window": """
            -- 300s windows hopping every 60s: event at ts lands in the 5
            -- window starts (ts_s // 60 - i) * 60, i in 0..4
            WITH e AS (
              SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events
            )
            SELECT event_type, ((ts_s // 60) - CAST(i AS BIGINT)) * 60 AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM e, range(0, 5) r(i)
            GROUP BY 1, 2
        """,
        "cur_zscore_by_type": """
            SELECT event_id, event_type,
                   round(CASE WHEN stddev_pop(value) OVER w = 0 THEN 0.0
                              ELSE (value - avg(value) OVER w)
                                   / (stddev_pop(value) OVER w) END, 4) AS zscore
            FROM events
            WINDOW w AS (PARTITION BY event_type)
        """,
        "j5_bloom_semi_revenue": """
            SELECT l_orderkey, round(sum(l_extendedprice), 2) AS revenue
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
            GROUP BY 1
        """,
        "cur_train_split": """
            SELECT doc_id,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) / 4294967296.0 AS u
              FROM documents
            )
        """,
        # true substring equality over every 32-char window (ASCII corpus →
        # identical to the engine's 32-byte windows); the engine's rolling
        # hash is exact up to 64-bit collisions
        "dedup_substring": """
            WITH d AS (
              SELECT doc_id, coalesce(text, '') AS b FROM documents
              WHERE length(coalesce(text, '')) >= 32
            ),
            wins AS (
              SELECT doc_id, substring(b, gs, 32) AS win
              FROM (SELECT doc_id, b,
                           unnest(generate_series(1, length(b) - 31, 1)) AS gs
                    FROM d)
            ),
            dw AS (SELECT DISTINCT doc_id, win FROM wins)
            SELECT DISTINCT a.doc_id AS id_left, c.doc_id AS id_right
            FROM dw a JOIN dw c ON a.win = c.win AND a.doc_id < c.doc_id
        """,
        # transitive closure over the full substring-pair set; the engine's
        # auto star-cap preserves connectivity, so components (and their min
        # ids) are invariant to the probe's decision
        "dedup_substring_clusters": """
            WITH RECURSIVE d AS (
              SELECT doc_id, coalesce(text, '') AS b FROM documents
              WHERE length(coalesce(text, '')) >= 32
            ),
            wins AS (
              SELECT doc_id, substring(b, gs, 32) AS win
              FROM (SELECT doc_id, b,
                           unnest(generate_series(1, length(b) - 31, 1)) AS gs
                    FROM d)
            ),
            dw AS (SELECT DISTINCT doc_id, win FROM wins),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
              FROM dw a JOIN dw c ON a.win = c.win AND a.doc_id < c.doc_id
            ),
            edges AS (SELECT id1 AS u, id2 AS v FROM pairs UNION SELECT id2, id1 FROM pairs),
            walk(id, label) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.id WHERE w.label < e.v
            )
            SELECT id AS doc_id, min(label) AS dup_group FROM walk GROUP BY id
        """,
        # same featurization as stages/dsir.py: lowercase alnum unigrams +
        # adjacent bigrams, md5-prefix buckets mod 8191, integer-quantized
        # floor-log2 ratios (order-independent sums → exact hash parity)
        "cur_dsir_scores": """
            WITH d AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS t
              FROM documents
            ),
            u AS (SELECT doc_id, unnest(t) AS f FROM d),
            bgidx AS (
              SELECT doc_id, t, unnest(generate_series(1, len(t) - 1, 1)) AS i
              FROM d WHERE len(t) >= 2
            ),
            b2 AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS f FROM bgidx),
            feats AS (SELECT doc_id, f FROM u UNION ALL SELECT doc_id, f FROM b2),
            fb AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 8191 AS b
              FROM feats
            ),
            tgt AS (SELECT b, count(*) AS c FROM fb WHERE doc_id % 50 = 0 GROUP BY b),
            src AS (SELECT b, count(*) AS c FROM fb GROUP BY b),
            tot AS (
              SELECT CAST(floor(log2((SELECT count(*) FROM fb) + 8191)) AS BIGINT) AS fns,
                     CAST(floor(log2((SELECT count(*) FROM fb WHERE doc_id % 50 = 0) + 8191)) AS BIGINT) AS fnt
            ),
            lam AS (
              SELECT s.b,
                     CAST(floor(log2(coalesce(t.c, 0) + 1))
                          - floor(log2(s.c + 1)) AS BIGINT)
                       + (SELECT fns - fnt FROM tot) AS l
              FROM src s LEFT JOIN tgt t ON s.b = t.b
            ),
            per_doc AS (
              SELECT fb.doc_id, sum(l.l) AS s FROM fb JOIN lam l ON fb.b = l.b
              GROUP BY fb.doc_id
            )
            SELECT doc.doc_id, CAST(coalesce(p.s, 0) AS BIGINT) AS dsir_score
            FROM documents doc LEFT JOIN per_doc p ON doc.doc_id = p.doc_id
        """,
        # same word grid as stages/chunking.chunk_batch: whitespace split of
        # trim(text), starts = generate_series(1, n_words, 24), 32-word
        # windows, inclusive list slicing, single-space join.
        "cur_chunk_documents": """
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents WHERE trim(text) <> ''
            ), s AS (
              SELECT doc_id, w, unnest(generate_series(1, len(w), 24)) AS gs FROM d
            )
            SELECT doc_id, gs AS chunk_start,
                   CAST(least(32, len(w) - gs + 1) AS BIGINT) AS n_chunk_words,
                   array_to_string(w[gs: gs+31], ' ') AS chunk_text
            FROM s
        """,
        "hh_frequent_tokens": """
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM documents
            )
            SELECT token, count(*) AS cnt FROM tok
            GROUP BY token
            HAVING count(*) >= 0.005 * (SELECT count(*) FROM tok)
        """,
        "w5_running_sum": """
            SELECT event_id, user_id,
                   round(SUM(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 4) AS running_sum
            FROM events
        """,
        "rj_purchase_window": """
            -- every purchase anchors a [ts, ts+2h) window; aggregate the same
            -- user's OTHER events inside it
            SELECT a.event_id AS anchor_id, count(*) AS n_follow,
                   round(sum(b.value), 4) AS sum_value
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 2 HOUR
             AND b.event_id <> a.event_id
            WHERE a.event_type = 'purchase'
            GROUP BY 1
        """,
        "sj_bigram_join": """
            -- brute-force word-bigram-set Jaccard self-join (threshold 0.4);
            -- single-word docs fall back to the word itself as their one
            -- shingle (dedup.shingle_hashes_batch word2 semantics)
            WITH w AS (
              SELECT doc_id AS id, string_split(text, ' ') AS ws
              FROM documents WHERE trim(text) <> ''
            ), tok AS (
              -- positions via unnest(generate_series) — no document-length
              -- cap (a fixed range(1, N) silently truncated 512+-word docs)
              SELECT DISTINCT id,
                     CASE WHEN len(ws) < 2 THEN ws[CAST(i AS INT)]
                          ELSE ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] END AS w
              FROM (
                SELECT id, ws,
                       unnest(generate_series(
                         1, CASE WHEN len(ws) < 2 THEN len(ws) ELSE len(ws) - 1 END, 1
                       )) AS i
                FROM w
              )
            ), sz AS (SELECT id, count(*) AS n FROM tok GROUP BY id),
            inter AS (
              SELECT a.id AS id_left, b.id AS id_right, count(*) AS i
              FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id GROUP BY 1, 2
            )
            SELECT id_left, id_right,
                   round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
            FROM inter
            JOIN sz sa ON sa.id = inter.id_left
            JOIN sz sb ON sb.id = inter.id_right
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.4
        """,
        "o2_topk_per_lang": """
            SELECT doc_id, lang, n_chars FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
            ) <= 3
        """,
        "a5_quantiles_by_lang": """
            SELECT lang,
                   quantile_disc(n_chars, 0.25) AS q25,
                   quantile_disc(n_chars, 0.50) AS q50,
                   quantile_disc(n_chars, 0.75) AS q75,
                   quantile_disc(n_chars, 0.90) AS q90,
                   quantile_disc(n_chars, 0.99) AS q99
            FROM documents GROUP BY lang
        """,
        # explicit-window formulation rather than ASOF JOIN: with duplicate
        # right timestamps per key, ASOF's pick among ties is unspecified on
        # both engines — this pins the engine's deterministic rule (max ts,
        # then max event_id)
        "w3_asof_join": """
            WITH l AS (
              SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
              FROM events WHERE event_type = 'purchase'
            ), r AS (
              SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
              FROM events WHERE event_type = 'view'
            )
            SELECT event_id, user_id, ts_us, value,
                   prior_event_id, prior_ts_us, prior_value
            FROM (
              SELECT l.event_id, l.user_id, l.ts_us, l.value,
                     coalesce(r.event_id, -1) AS prior_event_id,
                     coalesce(r.ts_us, -1) AS prior_ts_us,
                     coalesce(r.value, -1.0) AS prior_value,
                     row_number() OVER (
                       PARTITION BY l.event_id
                       ORDER BY r.ts_us DESC NULLS LAST, r.event_id DESC NULLS LAST
                     ) AS rn
              FROM l LEFT JOIN r
                ON l.user_id = r.user_id AND r.ts_us <= l.ts_us
            ) WHERE rn = 1
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "knn_cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3)
            SELECT qid AS query_idx, e.vec_id,
                   round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE), 4) AS cosine
            FROM q, embeddings e
            QUALIFY row_number() OVER (
              PARTITION BY qid ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id ASC
            ) <= 10
        """,
        # symbolic replica of the _q_image_pixel_stats pixel formula — gates
        # the PPM encode→decode→stats path byte-for-byte
        "mm_image_pixel_stats": """
            WITH d AS (
              SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
            ),
            ys AS (SELECT doc_id, w, h, unnest(generate_series(0, h - 1, 1)) AS y FROM d),
            xs AS (SELECT doc_id, w, h, y, unnest(generate_series(0, w - 1, 1)) AS x FROM ys),
            px AS (
              SELECT doc_id, w, h,
                     (doc_id * 7 + y * 31 + x * 13) % 256
                     + (doc_id * 7 + y * 31 + x * 13 + 5) % 256
                     + (doc_id * 7 + y * 31 + x * 13 + 10) % 256 AS s
              FROM xs
            )
            SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(sum(s) AS BIGINT) AS pixel_sum
            FROM px GROUP BY doc_id, w, h
        """,
        # seed centroids = vectors of the 8 smallest vec_ids, cell id = their
        # ascending-vec_id rank (same as stages/kmeans._bottom_k_rows); one
        # assignment step by squared L2, ties to the lowest cell id.
        "km_assign_cells": """
            WITH c AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS ce
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
            )
            SELECT vec_id, cid AS cell FROM (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding, c.ce), c.cid
                     ) AS rn
              FROM embeddings e, c
            ) WHERE rn = 1
        """,
        "text_quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\\s+') END AS toks
              FROM documents
            )
            SELECT doc_id,
                   len(toks)::BIGINT AS n_tokens,
                   round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter(toks, x -> lower(x) IN {_EN_STOPS})) * 1.0
                         / greatest(len(toks), 1), 6) AS stop_ratio
            FROM t
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT AS ws_tokens,
                   coalesce(list_aggregate(
                     list_transform(regexp_extract_all(text, '\\w+|[^\\w\\s]'),
                                    x -> ceil(length(x) / 4.0)::BIGINT), 'sum'), 0)::BIGINT AS bpe_tokens
            FROM documents
        """,
        "fingerprint_md5": """
            SELECT doc_id, md5(text) AS md5_fp FROM documents
        """,
        "dedup_ngram_jaccard": """
            WITH docs AS (SELECT doc_id, coalesce(text,'') AS text FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN length(text) < 4 THEN text ELSE gram END AS g
              FROM (
                SELECT doc_id, text,
                       unnest(list_transform(range(1, greatest(length(text)-2, 2)),
                                             i -> substring(text, i, 4))) AS gram
                FROM docs WHERE length(text) > 0
              )
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS id_left, b.doc_id AS id_right
                      FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1),
            inter AS (
              SELECT p.id_left, count(*) AS c
              FROM pairs p JOIN grams ga ON ga.doc_id = p.id_left
                           JOIN grams gb ON gb.doc_id = p.id_right AND gb.g = ga.g
              GROUP BY p.id_left
            )
            SELECT p.id_left,
                   round(CASE WHEN coalesce(s1.n,0) = 0 AND coalesce(s2.n,0) = 0 THEN 1.0
                              WHEN coalesce(s1.n,0) = 0 OR coalesce(s2.n,0) = 0 THEN 0.0
                              ELSE coalesce(i.c,0) * 1.0 / (s1.n + s2.n - coalesce(i.c,0))
                         END, 6) AS jaccard
            FROM pairs p
            LEFT JOIN sizes s1 ON s1.doc_id = p.id_left
            LEFT JOIN sizes s2 ON s2.doc_id = p.id_right
            LEFT JOIN inter i ON i.id_left = p.id_left
        """,
        "cur_decontaminate": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ),
            grams AS (
              SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
              FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
                    FROM toks WHERE len(tk) >= 3)
            ),
            bad AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
            hits AS (SELECT DISTINCT gr.doc_id FROM grams gr JOIN bad USING (g))
            SELECT t.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM toks t LEFT JOIN hits h ON h.doc_id = t.doc_id
        """,
        "cur_redact_pii": _redact_pii_oracle_sql(),
        "cur_quality_gopher": f"""
            WITH base AS (
              SELECT doc_id,
                     coalesce(text, '')
                     || CASE WHEN doc_id % 5 = 0
                             THEN chr(10) || 'promo offer click here now'
                               || chr(10) || 'promo offer click here now' ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                             THEN chr(10) || 'visit our sponsor page' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN '{_GOPHER_SPAM}' ELSE '' END
                     AS text
              FROM documents
            ),
            lines AS (
              SELECT doc_id, trim(l) AS line
              FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base)
              WHERE trim(l) <> ''
            ),
            lstat AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
                      FROM lines GROUP BY doc_id, line),
            ldoc AS (
              SELECT doc_id, sum(cnt) AS n_lines, count(*) AS n_distinct,
                     sum(len * (cnt - 1)) AS dup_chars, sum(len * cnt) AS tot_chars
              FROM lstat GROUP BY doc_id
            ),
            words AS (
              SELECT doc_id, lower(w) AS w
              FROM (SELECT doc_id,
                           unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                                       ELSE string_split_regex(trim(text), '\\s+') END) AS w
                    FROM base)
            ),
            wstat AS (SELECT doc_id, w, count(*) AS cnt, length(w) AS len
                      FROM words GROUP BY doc_id, w),
            wdoc AS (SELECT doc_id, sum(cnt) AS n_words, max(cnt) AS top_cnt,
                            sum(len * cnt) AS sum_len
                     FROM wstat GROUP BY doc_id)
            SELECT b.doc_id,
                   coalesce(l.n_lines, 0)::BIGINT AS n_lines,
                   round(coalesce((l.n_lines - l.n_distinct) * 1.0 / greatest(l.n_lines, 1), 0), 6)
                     AS dup_line_frac,
                   round(coalesce(l.dup_chars * 1.0 / greatest(l.tot_chars, 1), 0), 6)
                     AS dup_line_char_frac,
                   round(coalesce(w.top_cnt * 1.0 / greatest(w.n_words, 1), 0), 6)
                     AS top_word_frac,
                   round(coalesce(w.sum_len * 1.0 / greatest(w.n_words, 1), 0), 6)
                     AS mean_word_len,
                   (CASE WHEN coalesce((l.n_lines - l.n_distinct) * 1.0 / greatest(l.n_lines, 1), 0) <= 0.3
                          AND coalesce(l.dup_chars * 1.0 / greatest(l.tot_chars, 1), 0) <= 0.2
                          AND coalesce(w.top_cnt * 1.0 / greatest(w.n_words, 1), 0) <= 0.2
                          AND coalesce(w.n_words, 0) >= 5
                          AND coalesce(w.sum_len * 1.0 / greatest(w.n_words, 1), 0) >= 3.0
                          AND coalesce(w.sum_len * 1.0 / greatest(w.n_words, 1), 0) <= 10.0
                         THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM base b
            LEFT JOIN ldoc l USING (doc_id)
            LEFT JOIN wdoc w USING (doc_id)
        """,
        "cur_remove_boilerplate": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN 'subscribe to our newsletter' || chr(10) ELSE '' END
                     || 'copyright ' || (doc_id % 3)::VARCHAR || ' example corp' || chr(10)
                     || coalesce(text, '')
                     || chr(10) || 'doc footer ' || doc_id::VARCHAR AS text
              FROM documents
            ),
            lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS l,
                     generate_subscripts(string_split(text, chr(10)), 1) AS ord
              FROM base
            ),
            bl AS (SELECT trim(l) AS line FROM lines WHERE trim(l) <> ''
                   GROUP BY trim(l) HAVING count(DISTINCT doc_id) >= 10),
            kept AS (SELECT doc_id, l, ord FROM lines
                     WHERE trim(l) NOT IN (SELECT line FROM bl)),
            agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY ord) AS text,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
            SELECT b.doc_id, coalesce(a.text, '') AS text,
                   (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_removed
            FROM base b
            JOIN tot t USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 2)
            SELECT qid AS query_idx, e.vec_id,
                   round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE), 4) AS cosine
            FROM q, embeddings e
            QUALIFY row_number() OVER (
              PARTITION BY qid ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id ASC
            ) <= 5
        """,
    }
