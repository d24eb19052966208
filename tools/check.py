#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir> [queryName...]

Reads <verifyOutDir>/<name>/ parquet (Spark output) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
parquet tables in <sfDir>, normalizes both sides (sort columns by name, sort
rows by all columns), and reports match/mismatch per query.

Dev tool only — never shipped as part of the library.
"""
import json
import math
import re
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "tolist"):  # numpy array / list col
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        try:
            import numpy as np
            if isinstance(v, np.integer):
                return int(v)
            if isinstance(v, np.floating):
                return float(v)
            if isinstance(v, np.bool_):
                return bool(v)
        except ImportError:
            pass
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return pd.DataFrame(rows, columns=list(df.columns))


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    n_pass = n_fail = n_noorc = 0
    names = sorted(d.name for d in out_dir.iterdir() if d.is_dir())
    for name in names:
        if only and name not in only:
            continue
        spark_df = pd.read_parquet(out_dir / name)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            n_noorc += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name}: row count spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        # tolerance mode: an oracle starting its SQL with a
        # `-- reltol:<eps>` comment compares float cells within that
        # relative tolerance instead of exactly (for gates whose values
        # are mathematically identical but float-op-order sensitive)
        tol_m = re.search(r"--\s*reltol:([0-9.eE+-]+)", oracle[name])
        if tol_m:
            rtol = float(tol_m.group(1))
            ok = True
            for i in range(len(a)):
                for c in a.columns:
                    va, vb = a.iloc[i][c], b.iloc[i][c]
                    if va is None and vb is None:
                        continue
                    if isinstance(va, float) and isinstance(vb, float):
                        if math.isnan(va) and math.isnan(vb):
                            continue
                        if abs(va - vb) > rtol * max(abs(va), abs(vb), 1.0):
                            ok = False
                            break
                    elif va != vb:
                        ok = False
                        break
                if not ok:
                    break
            if ok:
                n_pass += 1
                continue
        elif a.equals(b):
            n_pass += 1
            continue
        # locate first differing cell
        diff_msgs = []
        for i in range(len(a)):
            for c in a.columns:
                va, vb = a.iloc[i][c], b.iloc[i][c]
                if va != vb and not (va is None and vb is None):
                    diff_msgs.append(f"row {i} col {c}: spark={va!r} duck={vb!r}")
                    if len(diff_msgs) >= 3:
                        break
            if len(diff_msgs) >= 3:
                break
        print(f"✗ {name}: VALUE mismatch — " + "; ".join(diff_msgs))
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
