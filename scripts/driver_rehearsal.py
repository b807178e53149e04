"""Driver-faithful correctness rehearsal.

Replicates the round driver's compare MORE STRICTLY than tests/test_queries_vs_oracle.py:
the driver sorts columns by name and hashes raw values, so an int64-vs-float64
dtype difference fails the hash even when every value is equal (the exact
failure mode of a8/a9 in CORRECTNESS_r04). This script therefore requires
  rows_match      — same row count
  schema_match    — same sorted column-name list
  dtype_match     — IDENTICAL pandas dtype per column after column sort
  hash_match      — md5 over pd.util.hash_pandas_object of the row-sorted frame
for every oracle-carrying query, at the driver's sf (default sf0.01).

Usage:  python scripts/driver_rehearsal.py [sf_dir] [query ...]
Exits non-zero if any query is not fully green.
"""

import hashlib
import importlib.util
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _to_pandas(result):
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Arrow-backed / extension dtypes → plain numpy so both sides align the
    # same way the driver's pandas conversion does.
    for c in df.columns:
        if isinstance(df[c].dtype, pd.ArrowDtype):
            df[c] = df[c].to_numpy()
        # the driver's hash is dtype-sensitive (a8/a9 r04 failure mode) but
        # float-rounds before hashing: m8's 1e-12 ULP difference between
        # Arrow round() and DuckDB round() was hash-GREEN in r04
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    if len(df):
        h.update(pd.util.hash_pandas_object(df, index=False).values.tobytes())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    entry = _load_entry()
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    report = {}
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        row = {"rows_match": None, "schema_match": None, "dtype_match": None,
               "hash_match": None, "err": None}
        try:
            got = _canon(_to_pandas(fn(sf_dir)))
            if name not in oracles:
                row["err"] = "no_oracle"
                row["rows"] = int(len(got))
                report[name] = row
                print(f"[rehearsal] {name}: no_oracle ({len(got)} rows, self-gated)")
                continue
            want = _canon(con.execute(oracles[name]).fetchdf())
            row["rows_match"] = len(got) == len(want)
            row["schema_match"] = list(got.columns) == list(want.columns)
            row["dtype_match"] = row["schema_match"] and all(
                got[c].dtype == want[c].dtype for c in got.columns
            )
            row["hash_match"] = (
                row["rows_match"] and row["dtype_match"]
                and _value_hash(got) == _value_hash(want)
            )
            row["rows"] = int(len(got))
            if not row["hash_match"]:
                n_bad += 1
                detail = []
                if not row["rows_match"]:
                    detail.append(f"rows {len(got)} vs {len(want)}")
                if not row["schema_match"]:
                    detail.append(f"cols {list(got.columns)} vs {list(want.columns)}")
                elif not row["dtype_match"]:
                    detail.append(
                        "dtypes "
                        + str({c: (str(got[c].dtype), str(want[c].dtype))
                               for c in got.columns
                               if got[c].dtype != want[c].dtype})
                    )
                else:
                    neq = [c for c in got.columns
                           if _value_hash(got[[c]]) != _value_hash(want[[c]])]
                    detail.append(f"value cols differ: {neq}")
                print(f"[rehearsal] {name}: FAIL ({'; '.join(detail)})")
            else:
                print(f"[rehearsal] {name}: green ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            n_bad += 1
            row["err"] = f"{type(e).__name__}: {e}"
            print(f"[rehearsal] {name}: ERROR {row['err']}")
        report[name] = row

    print(json.dumps({"sf": sf_dir, "n_bad": n_bad, "n": len(report)}))
    with open("/tmp/rehearsal.json", "w") as f:
        json.dump(report, f, indent=2)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
