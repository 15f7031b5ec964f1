"""Simulate the driver: run every queries() entry at a given sf and
compare against oracle_sql() via DuckDB (row count + schema + order-
insensitive value compare).  Usage: python tools/check_contract.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
        .round(9)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(mine)} rows)")
            n_pass += 1
            continue
        try:
            ref = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL  {name}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        # dtype-tolerant comparison
        eq = True
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    ok = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
                    ok = bool(ok.all())
                else:
                    ok = bool((a.astype(str) == b.astype(str)).all())
            except Exception:
                ok = bool((a.astype(str) == b.astype(str)).all())
            if not ok:
                bad = (a.astype(str) != b.astype(str)).idxmax()
                print(
                    f"FAIL  {name}: column {c} differs, e.g. row {bad}: "
                    f"{a.iloc[bad]!r} != {b.iloc[bad]!r}"
                )
                eq = False
                break
        if eq:
            print(f"PASS  {name} ({len(mine)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
