"""Tests for document sources/sinks (reference S1/S2: CSV readers at
run_NER_model.py:24, apply_transitivity.py:80-83; writers at
run_blocking.py:95-96)."""

import csv
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from entity_resolution__ray.sources.docs import (
    lift_documents_to_spans,
    read_docs,
    read_records_csv_as_docs,
    write_docs,
)


def test_lift_preserves_text_and_order():
    long_text = "word " * 40  # >= 64 chars → 3 spans with a media span between
    t = pa.table({"doc_id": [1, 2], "text": [long_text.strip(), "short"]})
    out = lift_documents_to_spans(t)
    rows = out.to_pylist()
    spans = rows[0]["spans"]
    assert [s["kind"] for s in spans] == ["text", "media", "text"]
    assert [s["offset"] for s in spans] == [0, 1, 2]
    assert "".join(s["text"] for s in spans) == long_text.strip()
    assert spans[1]["media_ref"] == "media://1/0"
    assert rows[1]["spans"] == [{"kind": "text", "text": "short", "media_ref": "", "offset": 0}]


def test_lift_vectorized_edge_cases():
    # no-space long text (fallback cut), multi-byte chars around the fallback
    # boundary, empty text, null text, and a space at position 0
    cases = [
        "x" * 100,                      # no space → cut at half
        ("é" * 40) + " tail",           # multi-byte; space after half
        "é" * 64,                        # multi-byte, no space → boundary-adjusted cut
        "",                              # empty
        None,                            # null → ""
        " " + "y" * 70,                 # only space at position 0 → rfind<=0 → half
        "café münchen " * 8,            # mixed multi-byte with spaces
    ]
    t = pa.table({"doc_id": [str(i) for i in range(len(cases))], "text": cases})
    out = lift_documents_to_spans(t).to_pylist()
    for row, text in zip(out, cases):
        text = text or ""
        spans = row["spans"]
        joined = "".join(s["text"] for s in spans)
        assert joined == text  # byte-exact round trip incl. multi-byte
        kinds = [s["kind"] for s in spans]
        if len(text.encode()) >= 64:
            assert kinds == ["text", "media", "text"]
            assert spans[1]["media_ref"] == f"media://{row['doc_id']}/0"
            assert [s["offset"] for s in spans] == [0, 1, 2]
        else:
            assert kinds == ["text"]
            assert spans[0]["media_ref"] == ""


def test_lift_on_sliced_and_chunked_input():
    # exercise nonzero array offsets (sliced batch) and chunked columns
    texts = ["pad row", "word " * 20, "short", None, "z" * 80]
    t = pa.table({"doc_id": list(range(5)), "text": texts}).slice(1, 4)
    out = lift_documents_to_spans(t).to_pylist()
    assert len(out) == 4
    assert "".join(s["text"] for s in out[0]["spans"]) == ("word " * 20)
    chunked = pa.table(
        {
            "doc_id": pa.chunked_array([[1, 2], [3]]),
            "text": pa.chunked_array([["a" * 70, "b"], ["c d " * 30]]),
        }
    )
    rows = lift_documents_to_spans(chunked).to_pylist()
    assert [len(r["spans"]) for r in rows] == [3, 1, 3]
    for r, txt in zip(rows, ["a" * 70, "b", "c d " * 30]):
        assert "".join(s["text"] for s in r["spans"]) == txt


def test_read_records_csv_as_docs(ray_session, tmp_path):
    path = str(tmp_path / "affiliationstrings_ids.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id1", "affil1"])
        w.writerow([7, "IBM Research Lab, NY"])
        w.writerow([9, "x" * 80])
    docs = read_records_csv_as_docs(path).take_all()
    by_id = {r["doc_id"]: r["spans"] for r in docs}
    assert set(by_id) == {"7", "9"}  # docs schema: doc_id is string
    assert "".join(s["text"] for s in by_id["7"]) == "IBM Research Lab, NY"
    assert len(by_id["9"]) == 3  # long text → interleaved media span


def test_read_docs_lance_dispatch(ray_session, tmp_path, monkeypatch):
    """Contract test for the Lance seam (the package is absent in this
    container): a ``.lance`` path or a ``_versions`` directory must dispatch
    to ``ray.data.read_lance`` with the pruned column list, and an
    ImportError from it must fall back to the parquet mirror."""
    calls = []

    sentinel = object()

    def fake_read_lance(path, columns=None, **kwargs):
        calls.append((path, columns))
        return sentinel

    monkeypatch.setattr(rd, "read_lance", fake_read_lance)
    out = read_docs(str(tmp_path / "docs.lance"), columns=["doc_id"])
    assert out is sentinel
    assert calls == [(str(tmp_path / "docs.lance"), ["doc_id"])]

    # a directory with _versions (Lance layout) also dispatches
    versioned = tmp_path / "ds"
    (versioned / "_versions").mkdir(parents=True)
    read_docs(str(versioned), columns=None)
    assert calls[-1] == (str(versioned), None)

    # ImportError (package absent) → parquet fallback on the same path
    def raising_read_lance(path, columns=None, **kwargs):
        raise ImportError("lance is not installed")

    monkeypatch.setattr(rd, "read_lance", raising_read_lance)
    t = pa.table({"doc_id": ["a"], "text": ["hello"]})
    pq_path = str(tmp_path / "mirror.lance")
    pq.write_table(lift_documents_to_spans(t), pq_path)
    back = read_docs(pq_path).take_all()
    assert back[0]["doc_id"] == "a"


def test_write_docs_lance_dispatch(ray_session, tmp_path, monkeypatch):
    """write_docs must try Lance first (the input_hint format) and only fall
    back to parquet when the package import fails — proven by injecting a
    fake ``lance`` module and asserting ``Dataset.write_lance`` is called."""
    import sys
    import types

    t = pa.table({"doc_id": ["a", "b"], "text": ["x", "y" * 70]})
    docs = rd.from_arrow(lift_documents_to_spans(t))
    written = []
    monkeypatch.setattr(
        type(docs), "write_lance", lambda self, path, **kw: written.append(path), raising=False
    )
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    out = str(tmp_path / "docs_lance_out")
    assert write_docs(docs, out) == out
    assert written == [out]


def test_write_docs_roundtrip(ray_session, tmp_path):
    t = pa.table({"doc_id": ["a", "b"], "text": ["hello world", "y" * 70]})
    docs = rd.from_arrow(lift_documents_to_spans(t))
    out = str(tmp_path / "docs_out")
    write_docs(docs, out)  # lance absent in this container → parquet mirror
    back = read_docs(out).take_all()
    orig = docs.take_all()
    key = lambda r: r["doc_id"]
    assert sorted(back, key=key) == sorted(orig, key=key)


def test_read_docs_lance_dispatch(monkeypatch, tmp_path):
    """Contract test for the Lance seam (the package isn't installed here):
    a path that LOOKS like a Lance dataset must route to rd.read_lance with
    the pruned column list, and an ImportError from the missing package must
    fall through to the Parquet mirror."""
    import ray.data as rd

    from entity_resolution__ray.sources import docs as docs_mod

    calls = {}

    def fake_read_lance(path, columns=None, **kwargs):
        calls["lance"] = (path, tuple(columns or ()))
        return "LANCE_DS"

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    lance_dir = tmp_path / "docs.lance"
    (lance_dir / "_versions").mkdir(parents=True)
    out = docs_mod.read_docs(str(lance_dir), columns=["doc_id", "spans"])
    assert out == "LANCE_DS"
    assert calls["lance"] == (str(lance_dir), ("doc_id", "spans"))

    # missing package → parquet fallback on the same path
    def raising_read_lance(path, columns=None, **kwargs):
        raise ImportError("lance is not installed")

    parquet_dir = tmp_path / "mirror.lance"
    parquet_dir.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": ["a"], "spans": [[{"kind": "text", "text": "t",
                                               "media_ref": "", "offset": 0}]]}),
        parquet_dir / "part-0.parquet",
    )
    monkeypatch.setattr(rd, "read_lance", raising_read_lance, raising=False)
    ds = docs_mod.read_docs(str(parquet_dir), columns=["doc_id"])
    assert ds.take_all() == [{"doc_id": "a"}]


def test_write_docs_lance_dispatch(monkeypatch, tmp_path):
    """write_docs must try Lance first and fall back to Parquet only on
    ImportError (the container has no lance package, so the fallback branch
    is the one that really executes end-to-end elsewhere in the suite)."""
    import sys
    import types

    from entity_resolution__ray.sources import docs as docs_mod

    written = {}

    class FakeDS:
        def write_lance(self, path):
            written["lance"] = path

        def write_parquet(self, path):
            written["parquet"] = path

    fake_lance = types.ModuleType("lance")
    monkeypatch.setitem(sys.modules, "lance", fake_lance)
    docs_mod.write_docs(FakeDS(), "/tmp/out.lance")
    assert written == {"lance": "/tmp/out.lance"}
