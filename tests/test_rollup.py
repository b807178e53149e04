"""Unit tests for stages/rollup.py (GROUP BY ROLLUP cascade)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.rollup import rollup_aggregate


def ref_rollup(df: pd.DataFrame, keys, sums, count_col):
    """Pandas reference: union of groupbys at every key prefix + grand total."""
    frames = []
    for i in range(len(keys), 0, -1):
        g = df.groupby(keys[:i], dropna=False, sort=False)[sums].sum().reset_index()
        g[count_col] = df.groupby(keys[:i], dropna=False, sort=False).size().values
        for k in keys[i:]:
            g[k] = None
        frames.append(g[keys + sums + [count_col]])
    total = pd.DataFrame({**{s: [df[s].sum()] for s in sums}, count_col: [len(df)]})
    for k in keys:
        total[k] = None
    frames.append(total[keys + sums + [count_col]])
    return pd.concat(frames, ignore_index=True)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: "␀" if v is None or v is pd.NA else str(v))
        else:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture()
def sample_df():
    rng = np.random.default_rng(3)
    return pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", "c"], size=500),
            "k2": rng.choice(["x", "y"], size=500),
            "m1": rng.integers(0, 1000, size=500),
            "m2": rng.integers(-50, 50, size=500),
        }
    )


def test_rollup_two_keys_matches_pandas(ray_session, sample_df):
    ds = rd.from_pandas(sample_df).repartition(7)
    out = rollup_aggregate(ds, ["k1", "k2"], ["m1", "m2"]).to_pandas()
    want = ref_rollup(sample_df, ["k1", "k2"], ["m1", "m2"], "n_rows")
    pd.testing.assert_frame_equal(norm(out), norm(want))
    # level cardinalities: 3×2 finest + 3 per-k1 + 1 grand total
    assert len(out) == 6 + 3 + 1


def test_rollup_single_key(ray_session, sample_df):
    ds = rd.from_pandas(sample_df[["k1", "m1"]]).repartition(3)
    out = rollup_aggregate(ds, ["k1"], ["m1"]).to_pandas()
    want = ref_rollup(sample_df[["k1", "m1"]], ["k1"], ["m1"], "n_rows")
    pd.testing.assert_frame_equal(norm(out), norm(want))


def test_rollup_requires_keys(ray_session, sample_df):
    with pytest.raises(ValueError):
        rollup_aggregate(rd.from_pandas(sample_df), [], ["m1"])


def test_pivot_sum_matches_pandas(ray_session, sample_df):
    from entity_resolution__ray.stages.rollup import pivot_sum

    ds = rd.from_pandas(sample_df).repartition(6)
    out = (
        pivot_sum(ds, "k1", "k2", "m1", ["x", "y", "missing"])
        .to_pandas().sort_values("k1").reset_index(drop=True)
    )
    for k1, grp in sample_df.groupby("k1"):
        row = out[out["k1"] == k1].iloc[0]
        assert row["m1_x"] == grp.loc[grp["k2"] == "x", "m1"].sum()
        assert row["m1_y"] == grp.loc[grp["k2"] == "y", "m1"].sum()
        assert row["m1_missing"] == 0  # absent domain value → all-zero column
        assert row["n_rows"] == len(grp)
