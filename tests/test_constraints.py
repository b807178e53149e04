"""Tests for constraint filtering (reference: apply_constraints.py,
geo_constraints.py:112-152, token_overlap_constraint.py:16-70)."""

import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.constraints import (
    ConstraintVerdict,
    apply_constraints,
    split_kept_dropped,
    threshold_filter,
)


def _edges_table():
    return pa.table(
        {
            "id_left": ["a", "a", "b", "c", "d"],
            "id_right": ["b", "c", "c", "d", "e"],
            "prob_match": [0.9, 0.5, 0.3, 0.7, 0.95],
            "src_countries": [["japan"], ["japan"], [], ["germany"], ["france", "germany"]],
            "cand_countries": [["japan"], ["canada"], ["canada"], [], ["germany"]],
            "src_text": ["ibm tokyo lab", "ibm tokyo lab", "other thing", "x y z", "joint lab"],
            "cand_text": ["ibm tokyo research", "ntt kyoto", "ntt kyoto", "unrelated", "joint lab"],
        }
    )


def test_geo_verdict_disjoint_prunes_overlap_keeps():
    out = ConstraintVerdict(use_geo=True)(_edges_table()).to_pylist()
    by_pair = {(r["id_left"], r["id_right"]): r for r in out}
    assert by_pair[("a", "b")]["keep"]  # same country
    assert not by_pair[("a", "c")]["keep"]  # disjoint non-empty
    assert by_pair[("a", "c")]["drop_reason"] == "geo_mismatch:japan|canada"
    assert by_pair[("b", "c")]["keep"]  # one side unknown → conservative
    assert by_pair[("c", "d")]["keep"]  # one side unknown
    assert by_pair[("d", "e")]["keep"]  # overlapping sets


def test_token_overlap_verdict():
    t = pa.table(
        {
            "id_left": ["a", "b", "c"],
            "id_right": ["x", "y", "z"],
            "prob_match": [0.9, 0.9, 0.9],
            "src_text": ["ibm research lab", "completely different words", "the of and"],
            "cand_text": ["ibm research center", "nothing shared here", "the of and"],
        }
    )
    v = ConstraintVerdict(use_geo=False, use_token_overlap=True, stopwords={"the", "of", "and"})
    out = v(t).to_pylist()
    assert out[0]["keep"]  # jaccard 2/4 = 0.5 ≥ 0.2
    assert not out[1]["keep"]  # jaccard 0
    assert out[2]["keep"]  # stopwords empty both sides → conservative no-prune


def test_threshold_and_split(ray_session):
    ds = rd.from_arrow(_edges_table())
    verdict = apply_constraints(ds, min_prob=0.45, use_geo=True)
    kept, dropped = split_kept_dropped(verdict.materialize())
    kept_pairs = {(r["id_left"], r["id_right"]) for r in kept.take_all()}
    dropped_pairs = {(r["id_left"], r["id_right"]) for r in dropped.take_all()}
    # (b,c) fails the 0.45 threshold entirely (never reaches verdict outputs)
    assert ("b", "c") not in kept_pairs | dropped_pairs
    assert ("a", "c") in dropped_pairs
    assert kept_pairs == {("a", "b"), ("c", "d"), ("d", "e")}


def test_threshold_filter_boundary(ray_session):
    ds = rd.from_arrow(pa.table({"id_left": ["a"], "id_right": ["b"], "prob_match": [0.45]}))
    assert threshold_filter(ds, 0.45).count() == 1  # >= keeps the boundary


def test_geo_verdict_null_country_elements_do_not_create_phantom_overlap():
    # a null element inside a countries list factorizes to -1; before the fix
    # it scattered a phantom bit shared by every null-bearing row, letting two
    # geo-disjoint rows silently escape the drop (ADVICE r3)
    t = pa.table(
        {
            "id_left": ["a", "b"],
            "id_right": ["x", "y"],
            "prob_match": [0.9, 0.9],
            "src_countries": pa.array([["japan", None], ["france", None]], type=pa.list_(pa.string())),
            "cand_countries": pa.array([["canada", None], [None, "france"]], type=pa.list_(pa.string())),
        }
    )
    out = ConstraintVerdict(use_geo=True)(t).to_pylist()
    by_pair = {(r["id_left"], r["id_right"]): r for r in out}
    assert not by_pair[("a", "x")]["keep"]  # japan vs canada: disjoint despite shared null
    assert by_pair[("b", "y")]["keep"]  # france overlaps for real
