#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare (sorted columns, row-by-row),
AND compare output type classes (the driver's hash is type-sensitive: a
DuckDB HUGEINT column vs a Spark int64 column hash-differs even when every
value is equal — exactly the drift that kept t21/e24-e28 driver-red through
r15 while this gate, then value-only, stayed green; VERDICT r15).

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, os, json, glob, math
import duckdb
import pyarrow
import pyarrow.types as pat
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def duck_class(t):
    """Type class of a DuckDB result column, at the granularity a typed
    (Arrow-buffer) hash can see: integer WIDTHS kept distinct (an
    uncast INTEGER literal against a Spark int64 is exactly the
    rows-ok/hash-fail drift this gate exists to catch), hugeint,
    decimal, float32/float64, and lists recursed into their element
    class."""
    s = str(t).upper()
    if s.endswith("[]"):
        return "list<%s>" % duck_class(str(t)[:-2])
    if s.startswith("DECIMAL"):
        return "decimal"
    widths = {"TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
              "BIGINT": "int64", "UTINYINT": "uint8", "USMALLINT": "uint16",
              "UINTEGER": "uint32", "UBIGINT": "uint64"}
    if s in widths:
        return widths[s]
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s == "FLOAT":
        return "float32"
    if s == "DOUBLE":
        return "float64"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.startswith("LIST(") or s.startswith("ARRAY("):
        # some DuckDB builds render list types functionally instead of
        # with the ELEM[] suffix; parse the element type out and recurse
        # so such a column can still MATCH its Arrow class (ADVICE r16:
        # the old 'list<?>' fallback could never equal 'list<elem>', so
        # a genuinely-matching oracle column would fail TYPE_DIFF)
        inner = str(t)[str(t).index("(") + 1 : str(t).rindex(")")]
        # element type may itself carry commas (LIST(DECIMAL(18,2))):
        # split on the TOP-LEVEL comma only, tracking paren depth, so
        # the recursion sees the full element type (ADVICE r17)
        depth, top = 0, len(inner)
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                top = i
                break
        return "list<%s>" % duck_class(inner[:top].strip())
    if s.startswith("STRUCT") or s.startswith("MAP"):
        return "struct"
    if s == "BLOB":
        return "binary"
    return s.lower()

def arrow_class(t):
    """Type class of a Spark-written parquet column (Arrow schema),
    same granularity as duck_class."""
    if pat.is_list(t) or pat.is_large_list(t):
        return "list<%s>" % arrow_class(t.value_type)
    if pat.is_decimal(t):
        return "decimal"
    for w in (8, 16, 32, 64):
        if getattr(pat, "is_int%d" % w)(t):
            return "int%d" % w
        if getattr(pat, "is_uint%d" % w)(t):
            return "uint%d" % w
    if pat.is_float32(t):
        return "float32"
    if pat.is_float64(t):
        return "float64"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_date(t):
        return "date"
    if pat.is_timestamp(t):
        return "timestamp"
    if pat.is_struct(t) or pat.is_map(t):
        return "struct"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "binary"
    return str(t)

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
            rel = con.sql(oracle[name])
            duck_cols = list(rel.columns)
            duck_types = {c: duck_class(t)
                          for c, t in zip(duck_cols, rel.types)}
            order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            duck_rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
        except Exception as e:
            print(f"ORACLE_ERR   {name:28s} {str(e).splitlines()[0][:110]}")
            n_fail += 1
            continue
        if sorted(duck_cols) != cols:
            print(f"COLS_DIFF    {name:28s} spark={cols} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # type-class gate BEFORE the value compare: the driver hashes
        # typed buffers, so equal values in differing type classes
        # (int64 vs HUGEINT/decimal, float vs double, ...) still fail
        # driver-side. Fail here the same day such an oracle lands.
        spark_types = {f.name: arrow_class(f.type) for f in tbl.schema}
        type_diffs = [(c, spark_types[c], duck_types[c]) for c in cols
                      if spark_types[c] != duck_types[c]]
        if type_diffs:
            n_fail += 1
            print(f"TYPE_DIFF    {name:28s} " + "; ".join(
                f"{c}: spark={s} duck={d}" for c, s, d in type_diffs))
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
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
          f"(all oracle-gated queries type-checked) ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
