"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query (or the names given on argv) at sf0.01 via
Spark AND via its DuckDB oracle SQL, then compares:

  1. row count
  2. column names + coarse dtypes (after sorting columns by name)
  3. order-insensitive values: every cell canonicalized to a string
     (floats via repr → bitwise-exact), rows sorted, then hashed

Usage:  python tools/check.py [query ...] [--sf DIR]
Exit code 0 iff all checked queries pass.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_and_easy_vectordb_spark.queries import QUERIES  # noqa: E402
from quick_and_easy_vectordb_spark.session import get_spark  # noqa: E402
from quick_and_easy_vectordb_spark.sources.catalog import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str, list[str]]:
    df = df[sorted(df.columns)]
    dtypes = [str(df[c].dtype) for c in df.columns]
    rows = sorted(
        "|".join(_cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h, rows


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    argv = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            if i + 1 >= len(args):
                print("--sf needs a directory argument")
                return 2
            sf_dir = args[i + 1]
            i += 1
        elif a.startswith("--"):
            # A typo like --fs=dir silently running the default sf dir is
            # exactly the failure mode that once made sf0.1 claims
            # unverifiable — reject like unknown query names.
            print(f"unknown flag: {a} (supported: --sf DIR / --sf=DIR)")
            return 2
        else:
            argv.append(a)
        i += 1
    unknown = [n for n in argv if n not in QUERIES]
    if unknown:
        print(f"unknown query name(s): {unknown}")
        return 2
    names = argv or list(QUERIES)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name in names:
        qd = QUERIES[name]
        try:
            sp = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(sp)} rows (no oracle — rows-only)")
            if len(sp) == 0:
                failures.append(name)
            continue
        try:
            du = con.sql(qd.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        n1, c1, h1, r1 = canonical(sp)
        n2, c2, h2, r2 = canonical(du)
        ok = n1 == n2 and c1 == c2 and h1 == h2
        status = "PASS " if ok else "FAIL "
        print(f"{status} {name}: spark {n1} rows [{h1}] vs duckdb {n2} rows [{h2}]")
        if not ok:
            failures.append(name)
            if c1 != c2:
                print(f"      columns: spark={c1} duckdb={c2}")
            if h1 != h2 and c1 == c2 and n1 == n2:
                diff = [(a, b) for a, b in zip(r1, r2) if a != b][:3]
                for a, b in diff:
                    print(f"      spark : {a[:200]}")
                    print(f"      duckdb: {b[:200]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
