#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet test tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name (as the driver does), and hash-compares values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame_hash(df):
    # Canonical: sort columns by name, stringify every value, hash rows.
    cols = sorted(df.columns)
    df = df[cols]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(canon(v) for v in row) + "\n").encode())
    return h.hexdigest()


def canon(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        # graft.MultiFile layout: the table is a DIRECTORY of part files
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"SCHEMA   {name}: spark={sorted(got.columns)} "
                  f"oracle={sorted(want.columns)}")
            n_fail += 1
            continue
        # dtype drift warning: a stricter driver compare could fail on it
        for c in sorted(got.columns):
            dg, dw = str(got[c].dtype), str(want[c].dtype)
            if dg != dw:
                print(f"DTYPE    {name}.{c}: spark={dg} oracle={dw}")
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        hg, hw = frame_hash(got), frame_hash(want)
        if hg != hw:
            print(f"HASH     {name}: mismatch ({len(got)} rows)")
            # show first differing row for debugging
            cols = sorted(got.columns)
            g, w = got[cols], want[cols]
            for i in range(len(g)):
                rg = [canon(v) for v in g.iloc[i]]
                rw = [canon(v) for v in w.iloc[i]]
                if rg != rw:
                    print(f"  row {i}: spark={rg}")
                    print(f"         oracle={rw}")
                    break
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(got)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = (con.execute(f"SELECT count(*) FROM read_parquet({files!r})")
                 .fetchone()[0]) if files else 0
            print(f"ROWSONLY {d}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
