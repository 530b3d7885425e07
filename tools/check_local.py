#!/usr/bin/env python3
"""DEV-ONLY correctness harness mirror (not part of the Scala library).

Replays the driver's t2 gate locally: for each query dumped by
`graft.Verify <sfDir> <outDir>`, run the DuckDB oracle from
oracle_sql.json over the same parquet tables, sort columns by name,
sort rows, and compare values exactly.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        # unify int widths across engines (int32 vs int64). Deliberately
        # NOT bool: the driver hashes stringified cells, so "True" vs "1"
        # forks the hash — leave bools alone so stringify_mismatch sees it
        # (the dedup_semantic_trained/_k64 5-round red was exactly this).
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint32", "Int64"):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def stringify_mismatch(got: pd.DataFrame, want: pd.DataFrame):
    """The driver hashes STRINGIFIED cell values — a value pair that is
    numerically equal but renders differently (Decimal('0E-16') vs 0.0,
    123 vs 123.0) passes a numeric compare and still fails the driver.
    Returns the first (column, got_str, want_str) rendering mismatch.
    """
    for c in got.columns:
        gs = got[c].map(lambda v: str(v))
        ws = want[c].map(lambda v: str(v))
        neq = gs.values != ws.values
        if neq.any():
            i = int(neq.argmax())
            return c, gs.iloc[i], ws.iloc[i]
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = normalize(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            rel = con.sql(sql)
            # HUGEINT (sum of BIGINT) converts to float64 in pandas; the
            # driver's hash compare then sees "123.0" vs "123" and fails
            # even though values match numerically. Treat as a local FAIL
            # so the oracle gets an explicit CAST(... AS BIGINT).
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} are HUGEINT — "
                      f"add CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1
                continue
            # DECIMAL outputs render with engine-specific scale/trailing
            # zeros ('0E-16' vs '0.0') — the r9 ohdsi_sql_dqd_check class.
            # Flag them on EITHER side before the value compare.
            dec = [c for c, t in zip(rel.columns, rel.types)
                   if str(t).startswith("DECIMAL")]
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0")
            spark_dec = [c for c, t in zip(spark_rel.columns, spark_rel.types)
                         if str(t).startswith("DECIMAL")]
            if dec or spark_dec:
                print(f"FAIL {name}: DECIMAL-typed output (oracle: {dec}, "
                      f"spark: {spark_dec}) — cast to DOUBLE/BIGINT on both "
                      f"sides; decimal renderings differ across engines")
                n_fail += 1
                continue
            want = normalize(rel.df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
                sm = stringify_mismatch(got, want)
                if sm is not None:
                    print(f"FAIL {name}: values equal but RENDER differently "
                          f"(driver hashes strings): col {sm[0]}: "
                          f"{sm[1]!r} vs {sm[2]!r}")
                    n_fail += 1
                    continue
                print(f"PASS {name} ({got.shape[0]} rows)")
                n_pass += 1
                continue
            except AssertionError as e:
                print(f"FAIL {name}: {str(e).splitlines()[0]}"[:300])
                diff = got.compare(want) if got.shape == want.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(5))
                n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
