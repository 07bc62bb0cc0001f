"""Local mimic of the driver's correctness gate: run each queries() entry and
its oracle_sql() side-by-side on an sf dir, compare row count, schema (column
names), and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified).

Usage: python scripts/check_gate.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()[:16]


def main(sf_dir: str):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = 0
    for name, fn in qs.items():
        try:
            mine = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(mine)} rows (no oracle)")
            n_pass += 1
            continue
        try:
            theirs = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            continue
        ok_rows = len(mine) == len(theirs)
        ok_schema = sorted(map(str, mine.columns)) == sorted(map(str, theirs.columns))
        ok_hash = ok_schema and value_hash(mine) == value_hash(theirs)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "PASS":
            n_pass += 1
        print(
            f"{status} {name}: rows {len(mine)}/{len(theirs)} schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL" and ok_schema:
            m = mine[sorted(mine.columns)].head(5)
            t = theirs[sorted(theirs.columns)].head(5)
            print("  mine:\n", m.to_string(), "\n  oracle:\n", t.to_string())
    print(f"{n_pass}/{len(qs)} pass")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
