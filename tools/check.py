#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the sf parquet tables, and compares:
row count, column names (sorted), and per-value hash. Mirrors the
documented driver behavior: columns sorted by name before hashing.
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):  # DuckDB HUGEINT via Arrow — driver floats these
        return repr(float(v))
    return str(v)

def table_hash(rows, cols):
    import hashlib
    h = hashlib.sha256()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for row in rows:
        for i in order:
            h.update(norm(row[i]).encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = spark_tbl.column_names
        # Driver-comparator parity: pandas cannot hash non-scalar cells
        # (list/struct/map/binary), so the driver errors any query that
        # emits one (round-8 q210/q217). The local gate must be at least
        # as strict — hard-fail nested output schemas here.
        import pyarrow.types as pat
        bad = [f.name for f in spark_tbl.schema
               if pat.is_nested(f.type) or pat.is_binary(f.type)
               or pat.is_large_binary(f.type)]
        if bad:
            print(f"FAIL {name}: non-scalar output columns {bad} "
                  f"(driver comparator cannot hash these)")
            n_fail += 1
            continue
        spark_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"ROWS {name}: {len(spark_rows)} rows (no oracle)")
            continue
        # containment oracles (SQL reads the emitted output back) pass
        # vacuously when the output is empty — the oracle SQL carries a
        # sentinel-row guard for that, and this is the belt-and-braces:
        # an empty emitted result for a self-referential oracle is a FAIL
        # even if the SQL comparison would agree.
        if not spark_rows and os.path.abspath(out_dir) in oracle[name]:
            print(f"FAIL {name}: empty output for a containment-oracled query")
            n_fail += 1
            continue
        try:
            # Arrow fetch: DuckDB HUGEINT (bare integer SUM) surfaces as
            # decimal128, which norm() floats — reproducing the driver's
            # "123.0" vs "123" hash drift instead of masking it the way
            # fetchall()'s Python ints did (round-1 lesson).
            res = con.execute(oracle[name])
            duck_tbl = res.fetch_arrow_table()
            duck_cols = duck_tbl.column_names
            duck_rows = [tuple(r.values()) for r in duck_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
        else:
            hs = table_hash(spark_rows, spark_cols)
            hd = table_hash(duck_rows, duck_cols)
            if hs != hd:
                print(f"FAIL {name}: hash mismatch")
                order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                shown = 0
                for i, (rs, rd) in enumerate(zip(spark_rows, duck_rows)):
                    vs = [norm(rs[j]) for j in order_s]
                    vd = [norm(rd[j]) for j in order_d]
                    if vs != vd:
                        print(f"  row {i}: spark={vs}")
                        print(f"          duck ={vd}")
                        shown += 1
                        if shown >= 3: break
                ok = False
        if ok:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
