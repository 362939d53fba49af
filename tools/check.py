#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
deliverable library is pure Scala). Runs each oracle SQL from
oracle_sql.json in DuckDB over the testdata parquet and compares with the
Spark result parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
"""
import json, sys, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{qdir}/*.parquet'").fetchall()
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        exp_rel = con.sql(oracles[name])
        exp_cols = sorted(exp_rel.columns)
        exp = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM ({oracles[name]}) oq").fetchall()
        ok = True
        msgs = []
        if got_cols != exp_cols:
            ok = False
            msgs.append(f"cols spark={got_cols} duck={exp_cols}")
        if len(got) != len(exp):
            ok = False
            msgs.append(f"rows spark={len(got)} duck={len(exp)}")
        if ok:
            for i, (g, e) in enumerate(zip(got, exp)):
                gn, en = [norm(x) for x in g], [norm(x) for x in e]
                if gn != en:
                    ok = False
                    msgs.append(f"row {i}: spark={gn} duck={en}")
                    if len(msgs) > 3:
                        break
        if ok:
            n_pass += 1
            print(f"[PASS] {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: " + "; ".join(msgs[:4]))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
