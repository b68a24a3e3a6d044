#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB hash-match: load each Spark result parquet, run the oracle SQL in
DuckDB over the same source tables, compare schema + sorted values exactly.

Usage: tools/compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(repr(v))
            else:
                r.append(str(v))
        out.append(tuple(r))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result")
            n_bad += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            oracle_df = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue

        s_cols = sorted(spark_df.columns)
        o_cols = sorted(oracle_df.columns)
        if s_cols != o_cols:
            print(f"SCHEMA   {name}: spark={s_cols} oracle={o_cols}")
            n_bad += 1
            continue
        s_types = {c: str(spark_df[c].dtype) for c in s_cols}
        o_types = {c: str(oracle_df[c].dtype) for c in o_cols}
        srows = canon(spark_df[s_cols].itertuples(index=False, name=None))
        orows = canon(oracle_df[o_cols].itertuples(index=False, name=None))
        if len(srows) != len(orows):
            print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"VALUES   {name}: {len(diffs)}/{len(srows)} rows differ; "
                  f"first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            if s_types != o_types:
                print(f"         dtypes spark={s_types} oracle={o_types}")
            n_bad += 1
            continue
        if s_types != o_types:
            print(f"DTYPE?   {name}: values match, dtypes differ "
                  f"spark={s_types} oracle={o_types}")
        print(f"OK       {name} ({len(srows)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
