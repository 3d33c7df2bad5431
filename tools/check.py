#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL in DuckDB over the testdata tables and compares it to
the parquet Verify dumped for the same query name. Strict compare: rows
sorted, columns sorted by name, exact equality (floats compared bitwise,
with a fallback report of max abs diff so near-misses are diagnosable).

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v

def key(row):
    return tuple((str(type(v)), str(v)) for v in row)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # DUCKDB_DB=<path>: file-backed database — blocking operators spill
    # through the buffer manager far more reliably than in :memory: mode
    # (r14 drive lesson: q_dedup_rewrite's string-heavy rebuild blew a
    # 48GB memory_limit to 130GB RSS in-memory and OOM-killed twice)
    db = os.environ.get("DUCKDB_DB", ":memory:")
    con = duckdb.connect(db)
    # heavy oracles at replica-scale corpora (100x drive) exceed RAM
    # without a spill path and get OOM-killed; cap memory below physical
    # and give DuckDB a temp dir so it spills instead. DUCKDB_THREADS
    # caps per-thread operator state (32 threads of a string-heavy hash
    # agg each hold their own partials — fewer threads, less peak RSS).
    mem = os.environ.get("DUCKDB_MEM", "64GB")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_spill")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET memory_limit='{mem}'")
    con.sql(f"SET temp_directory='{tmp}'")
    thr = os.environ.get("DUCKDB_THREADS")
    if thr:
        con.sql(f"SET threads={int(thr)}")
    # row order is irrelevant (the compare sorts) and preserving it is
    # what keeps giant intermediate pipelines fully resident in DuckDB
    con.sql("SET preserve_insertion_order=false")
    # a file-backed DUCKDB_DB persists views across runs: DROP first so a
    # retry against the same db file (the OOM-recovery scenario the knob
    # exists for) neither dies on a name collision nor — worse — silently
    # serves a PREVIOUS run's view for a table absent from this sfdir
    for t in TABLES:
        con.sql(f"DROP VIEW IF EXISTS {t}")
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Driver parity: its compare is dtype-aware (pandas hash), so a DuckDB
    # HUGEINT (uncast SUM) vs Spark int64 is a hash failure even when the
    # values match. Int widths hash identically in pandas (r02 evidence:
    # int32 rn vs BIGINT passed the driver gate), so the int family is one
    # class — HUGEINT is NOT in it (pandas renders it float64/object).
    # Shared by BOTH compare paths: the >BIG duckdb-side path must enforce
    # the same [DTYPE]/[LISTCOL] verdicts the strict path does, or a
    # replica-scale query prints [OK] locally while the driver gate fails
    # it (EXCEPT ALL implicitly casts mismatched types).
    INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
    def tclass(t):
        return "int" if t in INT_FAMILY else t
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = f"{outdir}/{name}"
        if not os.path.isdir(qdir):
            print(f"[MISS] {name}: no spark output dir"); n_bad += 1; continue
        # results past ~2M rows (full-table sorts like q_sort_global at
        # replica scale) would take hours through the Python fetch+sort
        # path — compare them inside DuckDB instead: equal row counts +
        # empty symmetric EXCEPT ALL over name-sorted columns. Value
        # semantics match the strict path except -0.0/NaN bit identity,
        # which no oracle emits.
        BIG = int(os.environ.get("CHECK_BIG_ROWS", "2000000"))
        try:
            n_got = con.sql(
                f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"[READ-ERR] {name}: {e}"); n_bad += 1; continue
        if n_got > BIG:
            try:
                got0 = con.sql(f"SELECT * FROM '{qdir}/*.parquet' LIMIT 0")
                exp0 = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
                cols = sorted(got0.columns)
                if sorted(exp0.columns) != cols:
                    print(f"[COLS] {name}: oracle={sorted(exp0.columns)} "
                          f"spark={cols}")
                    n_bad += 1; continue
                exp_t = {c: tclass(str(t))
                         for c, t in zip(exp0.columns, exp0.types)}
                got_t = {c: tclass(str(t))
                         for c, t in zip(got0.columns, got0.types)}
                tmis = {c: (exp_t[c], got_t[c])
                        for c in cols if exp_t[c] != got_t[c]}
                if tmis:
                    print(f"[DTYPE] {name}: {tmis}")
                    n_bad += 1; continue
                lcols = [c for c in cols if exp_t[c].endswith("[]")]
                if lcols:
                    print(f"[LISTCOL] {name}: driver compare crashes on "
                          f"list columns {lcols}")
                    n_bad += 1; continue
                cl = ", ".join(f'"{c}"' for c in cols)
                n_exp = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
                if n_exp != n_got:
                    print(f"[NROWS] {name}: oracle={n_exp} spark={n_got}")
                    n_bad += 1; continue
                diff = con.sql(
                    f"SELECT count(*) FROM ("
                    f"(SELECT {cl} FROM ({sql}) EXCEPT ALL "
                    f" SELECT {cl} FROM '{qdir}/*.parquet') UNION ALL "
                    f"(SELECT {cl} FROM '{qdir}/*.parquet' EXCEPT ALL "
                    f" SELECT {cl} FROM ({sql})))").fetchone()[0]
                if diff:
                    print(f"[VALS] {name}: {diff} differing rows "
                          f"(duckdb-side compare, {n_got} rows)")
                    n_bad += 1
                else:
                    print(f"[OK]   {name} rows={n_got} (duckdb-side compare)")
                    n_ok += 1
                continue
            except Exception as e:
                print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        try:
            exp = con.sql(sql)
            exp_cols = list(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"[READ-ERR] {name}: {e}"); n_bad += 1; continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"[COLS] {name}: oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            n_bad += 1; continue
        # Compare DuckDB-reported types per (name-sorted) column — see
        # tclass() above for the driver-parity rationale.
        exp_types = {c: tclass(str(t)) for c, t in zip(exp_cols, exp.types)}
        got_types = {c: tclass(str(t)) for c, t in zip(got_cols, got.types)}
        tmismatch = {c: (exp_types[c], got_types[c])
                     for c in exp_cols if exp_types[c] != got_types[c]}
        if tmismatch:
            print(f"[DTYPE] {name}: {tmismatch}")
            n_bad += 1; continue
        # Driver parity: pandas cannot sort/hash list columns (it crashes with
        # 'unhashable type: numpy.ndarray') — flag them instead of silently
        # passing a query the driver will error on.
        listcols = [c for c, t in exp_types.items() if t.endswith("[]")]
        if listcols:
            print(f"[LISTCOL] {name}: driver compare crashes on list columns {listcols}")
            n_bad += 1; continue
        # reorder both to sorted column order
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        erows = sorted([tuple(norm(r[i]) for i in eidx) for r in exp_rows], key=key)
        grows = sorted([tuple(norm(r[i]) for i in gidx) for r in got_rows], key=key)
        if len(erows) != len(grows):
            print(f"[NROWS] {name}: oracle={len(erows)} spark={len(grows)}")
            n_bad += 1; continue
        bad = None; maxdiff = 0.0
        for a, b in zip(erows, grows):
            if a == b: continue
            # float near-miss diagnosis
            diffs = []
            okish = True
            for x, y in zip(a, b):
                if x == y: continue
                if isinstance(x, float) and isinstance(y, float) and \
                   math.isfinite(x) and math.isfinite(y):
                    diffs.append(abs(x - y)); okish = False
                else:
                    okish = False
            if diffs: maxdiff = max(maxdiff, max(diffs))
            if not okish and bad is None:
                bad = (a, b)
        if bad:
            print(f"[DIFF] {name}: rows={len(erows)} maxfloatdiff={maxdiff:.3e}")
            print(f"    oracle: {bad[0]}")
            print(f"    spark : {bad[1]}")
            n_bad += 1
        else:
            print(f"[OK]   {name} rows={len(erows)}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
