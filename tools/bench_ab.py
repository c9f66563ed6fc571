#!/usr/bin/env python3
"""Same-day interleaved A/B bench (round-11 protocol): run HEAD (A) and a
prior-round worktree (B) alternately in ONE session — A,B,A,B — so ambient
host drift hits both sides equally, then attribute per-query deltas.

Each sweep is the standard `graft.Bench` JSON line (best-of-2 per query in
one JVM). Per query: a = min over the A sweeps, b = min over the B sweeps,
ratio = a/b. Queries present on only one side (new this round) are listed
separately. A >1.3x ratio under this protocol is attributable to CODE, not
ambient, because any host drift between sweeps is shared by the interleave.

Usage: bench_ab.py <dirA> <dirB> <sfDir> <out.json> [sweeps_per_side]
"""
import json
import os
import subprocess
import sys


def run_sweep(workdir, sf_dir, cpus="32"):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = cpus
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.replace("[info]", "").strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"no bench JSON from {workdir}:\n{out.stdout[-2000:]}\n{out.stderr[-500:]}")


def main():
    dir_a, dir_b, sf_dir, out_path = sys.argv[1:5]
    sweeps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    runs = {"A": [], "B": []}
    order = []
    for i in range(sweeps):
        # alternate the start side per round (A,B then B,A ...): a warmup
        # or contamination effect tied to position-in-round hits both
        # sides equally across the session
        pair = (("A", dir_a), ("B", dir_b)) if i % 2 == 0 else \
            (("B", dir_b), ("A", dir_a))
        for side, d in pair:
            print(f"[ab] sweep {i + 1}/{sweeps} side {side} ({d})", flush=True)
            r = run_sweep(d, sf_dir)
            runs[side].append(r)
            order.append(side)
    def best(side):
        best_q = {}
        for r in runs[side]:
            for q, t in r.get("queries", {}).items():
                if isinstance(t, (int, float)):
                    best_q[q] = min(best_q.get(q, float("inf")), t)
        return best_q
    a, b = best("A"), best("B")
    def spread(side, q):
        ts = [r["queries"][q] for r in runs[side]
              if isinstance(r.get("queries", {}).get(q), (int, float))]
        return (round(min(ts), 3), round(max(ts), 3)) if ts else None
    common = sorted(set(a) & set(b))
    per_query = {
        q: {"a_sec": round(a[q], 3), "b_sec": round(b[q], 3),
            # per-sweep spread per side: an attribution is solid only
            # when the two [min,max] ranges do not overlap
            "a_range": spread("A", q), "b_range": spread("B", q),
            "ratio": round(a[q] / b[q], 3) if b[q] > 0 else None}
        for q in common}
    flagged = {q: v for q, v in per_query.items()
               if v["ratio"] is not None and v["ratio"] > 1.3}
    improved = {q: v for q, v in per_query.items()
                if v["ratio"] is not None and v["ratio"] < 1 / 1.3}
    result = {
        "protocol": "interleaved A/B, one session, order " + ",".join(order),
        "a": dir_a, "b": dir_b, "sf_dir": sf_dir,
        "a_total_best": round(sum(a[q] for q in common), 1),
        "b_total_best": round(sum(b[q] for q in common), 1),
        "common_queries": len(common),
        "only_in_a": sorted(set(a) - set(b)),
        "only_in_b": sorted(set(b) - set(a)),
        "regressed_gt_1.3x": flagged,
        "improved_gt_1.3x": improved,
        "per_query": per_query,
        "raw_sweeps": {s: [r.get("queries", {}) for r in runs[s]]
                       for s in ("A", "B")},
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"[ab] A total {result['a_total_best']}s vs B {result['b_total_best']}s "
          f"over {len(common)} common queries; regressed>{1.3}x: "
          f"{sorted(flagged)}", flush=True)


if __name__ == "__main__":
    main()
