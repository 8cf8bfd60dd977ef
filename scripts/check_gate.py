"""Driver-gate rehearsal: run every queries() entry at a given sf and compare with
oracle_sql() via DuckDB (row count, column names, order-insensitive values).

Usage: python scripts/check_gate.py [sf_dir]
"""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def to_pandas(x):
    if isinstance(x, pa.Table):
        return x.to_pandas()
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    # usage: check_gate.py [sf_dir] [--only SUBSTR]  (filter entries by name)
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        except duckdb.Error:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if only in k}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        try:
            got = canon(to_pandas(fn(sf)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows, cols={list(got.columns)}")
            n_pass += 1
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        ok = True
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        elif list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    same = np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=1e-9, equal_nan=True)
                else:
                    same = (a == b).all()
                if not same:
                    bad = np.flatnonzero(~(a == b) if a.dtype.kind != "f" else
                                         ~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9))
                    print(f"FAIL {name}: column {c} differs at {len(bad)} rows; "
                          f"first: got={a[bad[0]]!r} want={b[bad[0]]!r} (row {bad[0]})")
                    ok = False
                    break
        if ok:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
