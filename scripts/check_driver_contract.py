"""Self-check: replicate the driver's correctness gate locally.

Runs every ``queries()`` entry at sf=0.01 in Spark, and its ``oracle_sql()``
twin in DuckDB, then compares row count, sorted column names, and
order-insensitive values (exact string compare after canonical sorting).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mapping_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    spark = get_spark("contract-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failures = []
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in osql:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) — no oracle")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        t0 = time.time()
        try:
            odf = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = neq[neq].index[:3]
                problems.append(
                    "values differ, e.g.\n  spark: "
                    + "\n  spark: ".join(str(cs.loc[i].to_dict()) for i in idx)
                    + "\n  duck : "
                    + "\n  duck : ".join(str(co.loc[i].to_dict()) for i in idx)
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(
                f"PASS {name}: {len(sdf)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
            )
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
