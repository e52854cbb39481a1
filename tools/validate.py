#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare (sorted columns, row-by-row).

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, os, json, glob, math
import duckdb
import pyarrow
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # only dirs that actually hold parquet are query outputs (the
    # digests/ forensics dir added in r14 is neither)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}")
                   and glob.glob(f"{out_dir}/{d}/*.parquet"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        tbl = pq.read_table(files[0]) if len(files) == 1 else \
            pyarrow.concat_tables([pq.read_table(f) for f in sorted(files)])
        cols = sorted(tbl.column_names)
        spark_rows = [tuple(canon(tbl.column(c)[i].as_py()) for c in cols)
                      for i in range(tbl.num_rows)]
        if name not in oracle:
            status = "ROWS_ONLY" if tbl.num_rows > 0 else "ROWS_ONLY_EMPTY?"
            n_rowsonly += 1
            print(f"{status:12s} {name:28s} rows={tbl.num_rows}")
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            duck_rows = [tuple(canon(r[i]) for i in order) for r in res.fetchall()]
        except Exception as e:
            print(f"ORACLE_ERR   {name:28s} {str(e).splitlines()[0][:110]}")
            n_fail += 1
            continue
        if sorted(duck_cols) != cols:
            print(f"COLS_DIFF    {name:28s} spark={cols} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        if spark_rows == duck_rows:
            print(f"PASS         {name:28s} rows={len(spark_rows)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"MISMATCH     {name:28s} spark_rows={len(spark_rows)} duck_rows={len(duck_rows)}")
            sset, dset = set(spark_rows), set(duck_rows)
            only_s = [r for r in spark_rows if r not in dset][:3]
            only_d = [r for r in duck_rows if r not in sset][:3]
            for r in only_s:
                print(f"   spark-only: {r}")
            for r in only_d:
                print(f"   duck-only : {r}")
            if not only_s and not only_d:
                for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                    if a != b:
                        print(f"   order-diff at row {i}: spark={a} duck={b}")
                        break
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
