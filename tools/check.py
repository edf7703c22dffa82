#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle
SQL against the sf parquet tables and compare to the Spark outputs that
graft.Verify wrote. Dev tool only — not part of the library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fpath = f"{outdir}/failures.json"
    if os.path.exists(fpath):
        for name, err in sorted(json.load(open(fpath)).items()):
            print(f"[FAIL] {name}: Verify threw: {err}")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spath = f"{outdir}/{name}"
        if not os.path.isdir(spath):
            print(f"[FAIL] {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spath}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            # The driver's hash is type-sensitive: DuckDB SUM over ints
            # widens to HUGEINT (int128) and mismatches Spark's BIGINT
            # even with identical values (NOTES.md #13). Python equality
            # below can't see that, so flag it separately.
            orel = con.sql(sql)
            hug = [c for c, t in zip(orel.columns, orel.types)
                   if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
            if hug:
                print(f"[WARN] {name}: oracle columns {hug} are "
                      f"HUGEINT/DECIMAL — CAST to BIGINT or the driver hash will mismatch")
        except Exception as e:
            print(f"[FAIL] {name}: exec error: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        gidx = [i for _, i in sorted((c, i) for i, c in enumerate(gcols))]
        widx = [i for _, i in sorted((c, i) for i, c in enumerate(wcols))]
        if sorted(gcols) != sorted(wcols):
            print(f"[FAIL] {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1; continue
        bad = None
        for r, (g, w) in enumerate(zip(got, want)):
            gr = [norm(g[i]) for i in gidx]
            wr = [norm(w[i]) for i in widx]
            if gr != wr:
                bad = (r, gr, wr); break
        if bad:
            r, gr, wr = bad
            print(f"[FAIL] {name}: first diff at row {r}:\n  spark : {gr}\n  oracle: {wr}")
            n_fail += 1
        else:
            print(f"[ok]   {name}: {len(got)} rows match exactly")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
