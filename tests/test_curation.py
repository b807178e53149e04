"""Curation operators: stratified sampling, canonical-doc dedup, rollups."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.stages.curation import canonical_docs, group_rollup, stratified_sample


def _docs():
    rows = [
        (1, "alpha beta", "en", "web", 10),
        (2, "alpha beta", "en", "web", 10),      # exact dup of 1, same length → keep id 1
        (3, "alpha beta gamma", "en", "web", 16),
        (4, "x", "de", "book", 1),
        (5, "", "de", "book", 0),
        (6, "alpha beta", "en", "book", 10),     # dup of 1 (cross-source)
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "source": [r[3] for r in rows],
        "n_chars": pa.array([r[4] for r in rows], type=pa.int64()),
    }))


def test_canonical_docs_keeps_longest_then_lowest_id(ray_session):
    out = canonical_docs(_docs()).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3, 4, 5]  # 2 and 6 fold into 1


def test_stratified_sample_bounds_and_determinism(ray_session):
    ds = _docs()
    s1 = stratified_sample(ds, key_col="source", n_per_key=2).to_pandas()
    s2 = stratified_sample(ds, key_col="source", n_per_key=2).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    assert (s1.groupby("source")["doc_id"].count() <= 2).all()
    # full strata kept when smaller than n
    assert (s1["source"] == "book").sum() == 2


def test_group_rollup(ray_session):
    out = group_rollup(_docs(), key_col="lang").to_pandas().set_index("lang")
    assert out.loc["en", "n_docs"] == 4
    assert out.loc["en", "total_ws_tokens"] == 2 + 2 + 3 + 2
    assert out.loc["de", "total_chars"] == 1


def test_remove_boilerplate_drops_frequent_lines(ray_session):
    from entity_resolution__ray.stages.curation import boilerplate_lines, remove_boilerplate

    rows = []
    for i in range(12):
        body = f"unique body {i}"
        rows.append({"doc_id": i, "text": f"subscribe now\n{body}\n  subscribe now  "
                     if i % 2 == 0 else f"subscribe now\n{body}\n\nfooter {i}"})
    ds = rd.from_items(rows)

    # DF is over DISTINCT docs: 'subscribe now' appears in all 12 docs (twice
    # in even docs — still df=12); empty + unique lines never flagged
    bl = boilerplate_lines(ds, min_df=10).to_pandas()
    assert list(bl["line"]) == ["subscribe now"] and int(bl["df"].iloc[0]) == 12

    out = remove_boilerplate(ds, min_df=10).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == "unique body 0"      # both copies removed (trim-matched)
    assert out.loc[0, "n_removed"] == 2
    assert out.loc[1, "text"] == "unique body 1\n\nfooter 1"  # empty line + footer kept
    assert out.loc[1, "n_removed"] == 1


def test_remove_boilerplate_guard_raises(ray_session):
    import pytest as _pytest

    from entity_resolution__ray.stages.curation import remove_boilerplate

    ds = rd.from_items([{"doc_id": i, "text": "shared line\nmore"} for i in range(4)])
    with _pytest.raises(ValueError):
        remove_boilerplate(ds, min_df=2, max_boilerplate_lines=1).to_pandas()


def test_grouped_topk(ray_session):
    from entity_resolution__ray.stages.curation import grouped_topk

    out = grouped_topk(_docs(), key_col="lang", sort_col="n_chars", k=2).to_pandas()
    en = out[out["lang"] == "en"].sort_values("n_chars", ascending=False)
    assert list(en["doc_id"]) == [3, 1]  # 16 chars, then tie(10,10,10)→lowest id
    de = out[out["lang"] == "de"]
    assert sorted(de["doc_id"]) == [4, 5]  # whole stratum when smaller than k


def test_grouped_quantiles_matches_quantile_disc(ray_session):
    import duckdb

    from entity_resolution__ray.stages.curation import grouped_quantiles

    rng = np.random.default_rng(7)
    ks = rng.choice(["a", "b", "c"], size=400).tolist()
    vs = rng.integers(0, 50, size=400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": ks, "v": vs}))
    got = (
        grouped_quantiles(ds, key_col="k", value_col="v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    import pandas as _pd

    df = _pd.DataFrame({"k": ks, "v": vs})  # noqa: F841 (duckdb view)
    want = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.25) q25, quantile_disc(v, 0.50) q50,"
        " quantile_disc(v, 0.75) q75, quantile_disc(v, 0.90) q90,"
        " quantile_disc(v, 0.99) q99 FROM df GROUP BY k ORDER BY k"
    ).df()
    for c in ["q25", "q50", "q75", "q90", "q99"]:
        assert list(got[c].astype(int)) == list(want[c].astype(int)), c


def test_grouped_distinct_count(ray_session):
    from entity_resolution__ray.stages.curation import grouped_distinct_count

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2), ("b", 3)]
    ds = rd.from_arrow(pa.table({
        "k": [r[0] for r in rows],
        "v": pa.array([r[1] for r in rows], type=pa.int64()),
    })).repartition(3)  # distinct values of one key span blocks AND buckets
    out = grouped_distinct_count(ds, key_col="k", val_col="v").to_pandas()
    got = dict(zip(out["k"], out["n_distinct"]))
    assert got == {"a": 2, "b": 3}


def test_grouped_zscore_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.RandomState(12)
    n = 2_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.randn(n) * 7 + 3, 4),
    })
    # a zero-variance key
    df.loc[df["event_type"] == "c", "value"] = 5.0

    from entity_resolution__ray.stages.curation import grouped_zscore

    out = grouped_zscore(
        rd.from_pandas(df).repartition(6), "event_type", "value",
        id_cols=("event_id",),
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    g = df.groupby("event_type")["value"]
    mu = df["event_type"].map(g.mean())
    sd = df["event_type"].map(g.std(ddof=0))
    want = np.where(sd > 0, (df["value"] - mu) / sd.replace(0, 1), 0.0)
    assert np.allclose(out["zscore"], want, atol=1e-9)
    assert (out.loc[out["event_type"] == "c", "zscore"] == 0.0).all()


def test_grouped_zscore_large_offset_low_variance_stability(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_resolution__ray.stages.curation import grouped_zscore

    # values ~1e6 with spread ~0.01: the naive E[x^2]-mean^2 form loses the
    # entire variance to float cancellation; the shifted-moments combiner
    # must stay within 1e-6 of the stable reference
    rng = np.random.RandomState(3)
    v = np.round(1_000_000.0 + rng.randn(4_000) * 0.01, 6)
    df = pd.DataFrame({
        "event_id": np.arange(len(v), dtype=np.int64),
        "event_type": np.where(np.arange(len(v)) % 2 == 0, "a", "b"),
        "value": v,
    })
    out = grouped_zscore(
        rd.from_pandas(df).repartition(7), "event_type", "value",
        id_cols=("event_id",),
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    g = df.groupby("event_type")["value"]
    mu = df["event_type"].map(g.mean())
    sd = df["event_type"].map(g.std(ddof=0))
    want = (df["value"] - mu) / sd
    assert np.allclose(out["zscore"], want, atol=1e-6)


def test_train_split_deterministic_and_growth_stable(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_resolution__ray.stages.curation import train_split

    df = pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64)})
    out = train_split(rd.from_pandas(df).repartition(5)).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # growth stability: the first 1,000 docs keep their split when 4,000 more
    # arrive (hash-based, not rank-based)
    small = train_split(rd.from_pandas(df.head(1000))).to_pandas()
    merged = small.merge(out, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # SQL-replicable: same md5-prefix arithmetic
    import hashlib
    u = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                  for i in range(5_000)]) / float(1 << 32)
    want = np.where(u < 0.8, "train", np.where(u < 0.9, "val", "test"))
    got = out.sort_values("doc_id")["split"].to_numpy()
    assert (got == want).all()


def test_grouped_sequence_ordered_concat(ray_session):
    from entity_resolution__ray.stages.curation import grouped_sequence

    t = pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "ord1": [3, 1, 2, 5, 5],
        "oid": [30, 10, 20, 2, 1],   # tie on ord1=5 broken by oid
        "v": ["z", "x", "y", "q", "p"],
    })
    out = (
        grouped_sequence(rd.from_arrow(t).repartition(3), "k", "v", ["ord1", "oid"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["seq"].tolist() == ["x>y>z", "p>q"]
    assert out["n_items"].tolist() == [3, 2]


def test_grouped_ntile_matches_sql_remainder_rule(ray_session):
    import duckdb

    from entity_resolution__ray.stages.curation import grouped_ntile

    rng = np.random.default_rng(2)
    t = pa.table({
        "k": rng.choice(["a", "b", "c"], size=101).tolist(),  # odd sizes → remainders
        "eid": list(range(101)),
        "v": rng.normal(size=101).round(6).tolist(),
    })
    out = (
        grouped_ntile(rd.from_arrow(t).repartition(4), "k", "v", n=4, id_col="eid")
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT eid, NTILE(4) OVER (PARTITION BY k ORDER BY v, eid) AS tile FROM t ORDER BY eid"
    ).fetchdf()
    assert out["tile"].astype("int64").tolist() == want["tile"].astype("int64").tolist()
    # tiny key (fewer rows than tiles): each row its own tile
    s = pa.table({"k": ["z", "z"], "eid": [1, 2], "v": [2.0, 1.0]})
    small = grouped_ntile(rd.from_arrow(s), "k", "v", n=4, id_col="eid").to_pandas()
    assert sorted(zip(small["eid"], small["tile"])) == [(1, 2), (2, 1)]
