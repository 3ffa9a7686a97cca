#!/usr/bin/env python3
"""Round-over-round bench comparison on the COMPARABLE subset.

Dev/judge tooling (driver-side python env); NOT part of the engine.

Usage: python3 scripts/bench_compare.py <bench_a.json> <bench_b.json>

The comparable subset is defined mechanically (ADVICE r6: the subset
methodology must regenerate from committed artifacts): a query is
comparable iff it appears in BOTH files' "queries" maps and in NEITHER
file's "failed" array. (Artifacts from before round 7 carry no "failed"
array and may contain sub-0.13s failure-floor entries; those rounds'
failures are known from their VERDICT files, not re-guessed here.)
Prints per-file totals over the subset, the delta, the per-query top-10
regressions/improvements, and both files' canaries so contention is
visible next to the delta it explains.
"""
import json
import sys


def load(path):
    """Accept either a raw Bench JSON line (bench_local.json) or a driver
    BENCH_r{N}.json artifact whose "tail" string embeds that line. Query
    keys normalize to the short id prefix ("q48") so the two shapes
    compare."""
    with open(path) as f:
        d = json.loads(f.read().strip())
    if "queries" not in d and "tail" in d:
        tail = d["tail"]
        d = json.loads(tail[tail.rindex('{"metric"'):].splitlines()[0])
    # normalize "q48_dedup_clusters" / "q48" / bare "48" (the tightest
    # stdout rung) to one key shape
    def norm(q):
        q = q.split("_")[0]
        return q if q.startswith("q") else "q" + q
    d["queries"] = {norm(q): v for q, v in d["queries"].items()}
    d["failed"] = [norm(q) for q in d.get("failed", [])]
    return d


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    failed = set(a.get("failed", [])) | set(b.get("failed", []))
    common = sorted((set(a["queries"]) & set(b["queries"])) - failed)
    ta = sum(a["queries"][q] for q in common)
    tb = sum(b["queries"][q] for q in common)
    print(f"comparable subset: {len(common)} queries "
          f"(a: {len(a['queries'])}, b: {len(b['queries'])}, failed-excluded: {len(failed)})")
    print(f"a total {ta:8.1f}s   [{sys.argv[1]}]")
    print(f"b total {tb:8.1f}s   [{sys.argv[2]}]")
    pct = (tb - ta) / ta * 100 if ta else float("nan")
    print(f"delta   {tb - ta:+8.1f}s  ({pct:+.0f}%)")
    for key in ("canary_first", "canary_last",
                "canary_shuffle_first", "canary_shuffle_last"):
        va, vb = a.get(key), b.get(key)
        if va is not None or vb is not None:
            print(f"{key:22s} a={va} b={vb}")
    deltas = sorted(((b["queries"][q] - a["queries"][q], q) for q in common))
    print("top regressions (b slower):")
    for d, q in deltas[-10:][::-1]:
        if d > 0:
            print(f"  {q:28s} {a['queries'][q]:6.2f} -> {b['queries'][q]:6.2f}  ({d:+.2f})")
    print("top improvements (b faster):")
    for d, q in deltas[:10]:
        if d < 0:
            print(f"  {q:28s} {a['queries'][q]:6.2f} -> {b['queries'][q]:6.2f}  ({d:+.2f})")
    print("\nsubset queries: " + ",".join(common))


if __name__ == "__main__":
    main()
