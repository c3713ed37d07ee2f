"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count,
schema width, and order-insensitive values (columns sorted by name)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pdf_parser_spark.corpus import ensure_corpus  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        try:
            if df[c].dtype.kind == "f":
                df[c] = df[c].round(6)
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for x, y in zip(av, bv):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if abs(xf - yf) > 1e-9:
                    return False
            elif str(x) != str(y):
                return False
    return True


def main(only: str | None = None) -> int:
    ensure_corpus(SF_DIR)
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        a, b = canon(sdf), canon(ddf)
        kinds = lambda df_: {
            c: ("i" if df_[c].dtype.kind == "u" else df_[c].dtype.kind)
            for c in df_.columns
        }
        if kinds(a) != kinds(b):
            # dtype-kind mismatch = the driver hash artifact class (HUGEINT
            # -> float64 vs int64), even when values compare equal here
            failures += 1
            print(f"FAIL {name}: dtype kinds {kinds(a)} vs {kinds(b)}")
        elif frames_equal(a, b):
            print(f"OK   {name}: {len(a)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: spark {len(a)}x{len(a.columns)} vs duckdb {len(b)}x{len(b.columns)}")
            print("  spark cols:", list(a.columns), " duckdb cols:", list(b.columns))
            if list(a.columns) == list(b.columns) and len(a) == len(b):
                for c in a.columns:
                    neq = [
                        (i, a[c][i], b[c][i])
                        for i in range(len(a))
                        if str(a[c][i]) != str(b[c][i])
                    ][:3]
                    if neq:
                        print(f"  col {c} first diffs: {neq}")
            else:
                print("  spark head:", a.head(3).to_dict("records"))
                print("  duck  head:", b.head(3).to_dict("records"))
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
