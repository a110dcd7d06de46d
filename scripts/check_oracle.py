"""Local replica of the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` side by side at a given
sf, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if isinstance(dt, pd.api.extensions.ExtensionDtype):
            # normalize pandas nullable dtypes to numpy equivalents
            if pd.api.types.is_integer_dtype(dt) or \
                    pd.api.types.is_float_dtype(dt):
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype(object)
            dt = df[c].dtype
        if dt == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(ours) != len(oracle):
        problems.append(f"row count {len(ours)} vs {len(oracle)}")
    if sorted(ours.columns) != sorted(oracle.columns):
        problems.append(f"columns {sorted(ours.columns)} vs {sorted(oracle.columns)}")
        return problems
    a, b = canon(ours), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if len(av) != len(bv):
            continue
        if np.issubdtype(a[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             rtol=0, atol=0, equal_nan=True)
            exact = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not exact.all():
                bad = int((~exact).sum())
                problems.append(
                    f"col {c}: {bad} value mismatches "
                    f"(first: {av[~exact][:2]} vs {bv[~exact][:2]})")
        else:
            eq = (pd.Series(av) == pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                bad = int((~eq).sum())
                problems.append(
                    f"col {c}: {bad} mismatches "
                    f"(first: {av[~eq.to_numpy()][:2]} vs {bv[~eq.to_numpy()][:2]})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(ours)} rows, "
                  f"cols {list(ours.columns)}")
            n_rows_only += 1
            continue
        try:
            oracle = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ours, oracle)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ours)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
