"""PII redaction operator (stages/pii.py)."""
import re

import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.pii import (
    REDACTIONS,
    oracle_redact_sql,
    redact_pii,
    redact_pii_batch,
)


CASES = [
    # (input, redacted, (n_email, n_card, n_ip, n_phone))
    ("mail bob.smith+tag@sub.example.co.uk now", "mail <EMAIL> now", (1, 0, 0, 0)),
    ("cards 4111 1111 1111 1111 and 4111-2222-3333-4444", "cards <CARD> and <CARD>", (0, 2, 0, 0)),
    ("ip 192.168.1.254 gw 8.8.8.8", "ip <IP> gw <IP>", (0, 0, 2, 0)),
    ("call +1 (415) 555-0199 ok", "call <PHONE> ok", (0, 0, 0, 1)),
    ("nothing sensitive 123 here", "nothing sensitive 123 here", (0, 0, 0, 0)),
    ("", "", (0, 0, 0, 0)),
    (None, "", (0, 0, 0, 0)),
]


def test_redact_batch_cases():
    t = pa.table({"text": [c[0] for c in CASES]})
    out = redact_pii_batch(t)
    assert out["text"].to_pylist() == [c[1] for c in CASES]
    got_counts = list(zip(*(out[f"n_{n}"].to_pylist() for n, _, _ in REDACTIONS)))
    assert got_counts == [c[2] for c in CASES]


def test_redaction_order_prevents_remark():
    # an email's digits / a card's digits must never re-match as phone/ip
    t = pa.table({"text": ["a1234567890@x.io and 4111 1111 1111 1111"]})
    out = redact_pii_batch(t)
    assert out["text"].to_pylist() == ["<EMAIL> and <CARD>"]
    assert out["n_phone"].to_pylist() == [0] and out["n_ip"].to_pylist() == [0]


def test_counts_are_matches_actually_redacted():
    # the card also looks phone-ish, but card masks first -> n_phone 0
    t = pa.table({"text": ["4111 1111 1111 1111"]})
    out = redact_pii_batch(t)
    assert out["n_card"].to_pylist() == [1]
    assert out["n_phone"].to_pylist() == [0]


def test_categories_subset_and_passthrough_columns():
    t = pa.table({"doc_id": [1], "text": ["a@b.io 10.0.0.1"], "extra": ["keep"]})
    out = redact_pii_batch(t, categories=["email"])
    assert out["text"].to_pylist() == ["<EMAIL> 10.0.0.1"]
    assert out.column_names == ["doc_id", "text", "extra", "n_email"]
    assert out["extra"].to_pylist() == ["keep"]


def test_python_re_agrees_on_patterns():
    # RE2 and Python re agree on these lookaround-free patterns: an
    # independent engine confirming each pattern's matches on the cases
    for text, _, counts in CASES:
        cur = text or ""
        for (name, pattern, mask), want in zip(REDACTIONS, counts):
            assert len(re.findall(pattern, cur)) == want, (name, text)
            cur = re.sub(pattern, mask, cur)


def test_redact_pii_dataset(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["x a@b.io", "no pii"]}))
    out = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["x <EMAIL>", "no pii"]
    assert out["n_email"].tolist() == [1, 0]


def test_oracle_sql_replicates_kernel():
    duckdb = pytest.importorskip("duckdb")
    t = pa.table({"text": [c[0] for c in CASES]})
    got = redact_pii_batch(t)
    ex = oracle_redact_sql("coalesce(text, '')")
    con = duckdb.connect()
    con.register("t", t)
    cols = ", ".join(
        [f"{ex['text']} AS text"] + [f"{ex[f'n_{n}']} AS n_{n}" for n, _, _ in REDACTIONS]
    )
    want = con.execute(f"SELECT {cols} FROM t").fetch_arrow_table()
    for col in ["text"] + [f"n_{n}" for n, _, _ in REDACTIONS]:
        assert got[col].to_pylist() == want[col].to_pylist(), col
