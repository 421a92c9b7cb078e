"""Local approximation of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin (DuckDB) on the
same sf dir, then compares row count, column-name set, and an order-insensitive
value comparison (rows sorted by all columns; NaN/NaT/None unified; floats
compared exactly — the queries themselves round).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64").where(s.notna(), -1)
        elif s.dtype == object:
            df[c] = s.where(s.notna(), None).map(lambda x: repr(x))
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.fillna(np.inf)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(mine.columns) != sorted(oracle.columns):
        problems.append(f"columns differ: mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}")
        return problems
    if len(mine) != len(oracle):
        problems.append(f"row count differs: mine={len(mine)} oracle={len(oracle)}")
    # The driver's value hash is dtype-sensitive (an int64 engine column vs a
    # HUGEINT->float64 oracle column hash-mismatches even when values agree), so
    # flag any dtype divergence as a failure here too.
    for c in sorted(mine.columns):
        mk, ok_ = mine[c].dtype.kind, oracle[c].dtype.kind
        if mk != ok_ and {mk, ok_} != {"O"} and not ({mk, ok_} <= {"i", "u", "b"}):
            problems.append(f"dtype differs on {c}: mine={mine[c].dtype} oracle={oracle[c].dtype}")
    a, b = normalize(mine), normalize(oracle)
    if len(a) == len(b):
        neq = (a != b)
        bad_cols = [c for c in a.columns if neq[c].any()]
        if bad_cols:
            c = bad_cols[0]
            i = int(neq[c].idxmax())
            problems.append(
                f"values differ in {bad_cols} (first: col={c} row={i} "
                f"mine={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r})"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    # heavy oracles (all-pairs shingle self-joins) spill GBs of temp; keep it
    # out of the repo cwd (default is ./.tmp) so git never sees it
    con.execute("PRAGMA temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = mine is not None and len(mine) >= 0
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s) [rows-only check]")
            n_rows_only += 1
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        problems = compare(name, mine, oracle)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
