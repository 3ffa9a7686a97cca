#!/usr/bin/env python3
"""Local self-check that emulates the driver's DuckDB-oracle compare.

Dev-only tooling (driver-side python env); NOT part of the engine.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares: column names (sorted), COLUMN TYPES (sorted
by name, normalized), row count, and value-hash over rows sorted by all
columns. Mirrors BASELINE.md's "hash-match" gate as strictly as we can
guess it — exact value equality, no float tolerance.

The type check matters: the driver's compare hashes *typed* values (DuckDB
HUGEINT exports to Arrow as decimal128, not int64), so an oracle `sum()` of
an integer column that is value-equal but HUGEINT-typed still fails the
driver gate. Round 1 lost 10 queries to exactly that while this script
printed PASS (ADVICE.md r1) — hence TYPES-MISMATCH is now a FAIL here.
"""
import sys, json, glob, os
import duckdb

def norm_type(t):
    # Collapse integer widths (the driver compares python ints equal across
    # int32/int64 parquet/arrow) but keep HUGEINT distinct — it round-trips
    # as decimal128 and breaks the typed hash.
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    return s

def norm_cell(v):
    # Normalize engine-representation differences that are not value
    # differences: timestamps → isoformat, Decimal → str, floats → repr bits.
    import datetime, decimal
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def table_key(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    results = {}
    # A query that threw Spark-side leaves no result dir — flag it rather
    # than silently skipping (q65 r2 dev: Verify logged the failure but this
    # script reported all-pass).
    have = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - have):
        results[name] = "MISSING-RESULT (query failed in Verify?)"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_cols = list(got.columns)
        got_types = dict(zip(got_cols, [norm_type(t) for t in got.types]))
        got_rows = got.fetchall()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got_rows)}"
            continue
        try:
            exp = con.sql(oracles[name])
            exp_cols = list(exp.columns)
            exp_types = dict(zip(exp_cols, [norm_type(t) for t in exp.types]))
            exp_rows = exp.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"COLS-MISMATCH got={sorted(got_cols)} exp={sorted(exp_cols)}"
            continue
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if got_types[c] != exp_types[c]}
        if tdiff:
            results[name] = f"TYPES-MISMATCH (spark,oracle)={tdiff}"
            continue
        if len(got_rows) != len(exp_rows):
            results[name] = f"ROWS-MISMATCH got={len(got_rows)} exp={len(exp_rows)}"
            continue
        g = table_key(got_rows, got_cols)
        e = table_key(exp_rows, exp_cols)
        if g != e:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            results[name] = f"VALUES-MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK rows={len(got_rows)}"
    bad = 0
    for name, r in sorted(results.items()):
        status = "PASS" if r.startswith("OK") or r.startswith("NO-ORACLE") else "FAIL"
        if status == "FAIL":
            bad += 1
        print(f"[{status}] {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
