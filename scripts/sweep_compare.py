#!/usr/bin/env python3
"""Diff two graft.Verify output directories by result-content checksums.

Dev-only tooling (driver-side python env); NOT part of the engine.

Usage: python3 scripts/sweep_compare.py <verifyDirA> <verifyDirB>

Each Verify run writes a `<name>.profile.json` beside every result parquet
(order-insensitive table checksum + per-column checksums). Two runs of the
same suite under DIFFERENT physical conditions — multi-file input layout,
AQE fully enabled, different shuffle widths — must agree on every checksum;
this script reports any query whose content differs, localized to the
column level. Exit 0 = identical, 1 = any delta or missing profile.
"""
import sys, json, glob, os

def load(d):
    out = {}
    for p in glob.glob(os.path.join(d, "*.profile.json")):
        name = os.path.basename(p)[: -len(".profile.json")]
        with open(p) as f:
            out[name] = json.load(f)
    return out

def main():
    da, db = sys.argv[1], sys.argv[2]
    a, b = load(da), load(db)
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    deltas = []
    for name in sorted(set(a) & set(b)):
        pa, pb = a[name], b[name]
        if pa["rows"] != pb["rows"]:
            deltas.append((name, f"rows {pa['rows']} != {pb['rows']}"))
            continue
        if pa["table_checksum"] != pb["table_checksum"]:
            cols = []
            for c in pa["columns"]:
                ca, cb = pa["columns"][c], pb["columns"].get(c)
                if cb is None or ca["checksum"] != cb["checksum"]:
                    cols.append(c)
            deltas.append((name, f"table checksum differs (columns: {cols})"))
    print(f"compared {len(set(a) & set(b))} queries: "
          f"{len(deltas)} content deltas, {len(only_a)} only in A, "
          f"{len(only_b)} only in B")
    for name, msg in deltas:
        print(f"  DELTA {name}: {msg}")
    for name in only_a:
        print(f"  ONLY-A {name}")
    for name in only_b:
        print(f"  ONLY-B {name}")
    sys.exit(1 if (deltas or only_a or only_b) else 0)

if __name__ == "__main__":
    main()
