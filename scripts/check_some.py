#!/usr/bin/env python3
"""Targeted correctness re-check: run NAMED queries via graft.tools.RunOne
(one JVM each) at a given SF and compare each against its DuckDB oracle —
the single-query loop CLAUDE.md describes, without the full Verify sweep.

Usage: python3 scripts/check_some.py <sfdir> <query> [<query> ...]
"""
import json, os, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1]
QUERIES = sys.argv[2:]
OUT = "/tmp/verify_one"

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

CP = os.path.join(REPO, "target/scala-2.13/classes") + ":/opt/spark/jars/*"
ENV = dict(os.environ, SPARK_GRAFT_CPUS="8")

def jrun(main, *args):
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx8g", "-XX:ReservedCodeCacheSize=1g",
            "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", CP, main] + list(args))
    return subprocess.run(cmd, env=ENV, capture_output=True, text=True)

def main():
    r = jrun("graft.tools.DumpOracles", f"{OUT}_oracles.json")
    if r.returncode != 0:
        print(r.stderr[-2000:]); sys.exit("oracle dump failed")
    oracle = json.load(open(f"{OUT}_oracles.json"))

    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    n_fail = 0
    for name in QUERIES:
        r = jrun("graft.tools.RunOne", name, SF, OUT)
        if r.returncode != 0:
            print(f"FAIL {name}: RunOne crashed")
            print(r.stderr[-2500:]); n_fail += 1; continue
        if not glob.glob(f"{OUT}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"okNA {name}: rows={len(got)} (no oracle)"); continue
        exp = con.execute(oracle[name]).fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        def rows(df):
            return sorted(tuple(repr(v) for v in r) for r in df.itertuples(index=False))
        gt, et = rows(got), rows(exp)
        if gt == et:
            print(f"ok   {name}: rows={len(gt)}")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(gt)} vs {len(et)}")
            for a, b in [(a, b) for a, b in zip(gt, et) if a != b][:3]:
                print(f"   spark: {a}\n   duck : {b}")
    print(f"== {len(QUERIES) - n_fail} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
