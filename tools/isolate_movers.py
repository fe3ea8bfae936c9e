#!/usr/bin/env python3
"""Mechanical ×1000-sweep isolation (VERDICT r12 item 4).

Usage:
  python3 tools/isolate_movers.py NEW_SWEEP.json OLD_SWEEP.json \
      [--threshold 2.0] [--min-sec 0.2] [--run SFDIR] [--reps 2] \
      [--out-dir /tmp/isolated]

Diffs two graft.Bench sweep JSONs (the {"queries": {name: sec}} shape)
and lists every query whose NEW time is >= threshold × its OLD time
and >= min-sec absolute — the movers that the isolation methodology
says must get a same-day isolated rep before being called real.

With --run SFDIR it then runs each mover ISOLATED: one fresh JVM per
query (SPARK_GRAFT_BENCH_ONLY=<name>, min-of---reps inside), writing
per-query JSONs under --out-dir and printing an isolation table ready
to paste into BASELINE.md. One JVM per query is the point — in-sweep
numbers are context-dominated (cache/GC/page-cache state left by 180
prior queries); the r12 sweep showed a zero-change pure scan at 4.7×
in-sweep and parity isolated.

Exit code: 0 when no movers (or all isolated runs completed), 1 on a
failed isolated run.
"""
import argparse
import json
import os
import subprocess
import sys


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    qs = dict(doc.get("queries", {}))
    # setup-phase renders are reported separately and are NOT query
    # regressions; ignore them here
    return qs


def movers(new, old, threshold, min_sec):
    out = []
    for name, nsec in sorted(new.items()):
        osec = old.get(name)
        if osec is None or osec <= 0:
            continue
        ratio = nsec / osec
        if ratio >= threshold and nsec >= min_sec:
            out.append((name, osec, nsec, ratio))
    return out


def run_isolated(name, sf_dir, reps, out_dir, repo_root):
    out_json = os.path.join(out_dir, f"isolated_{name}.json")
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": name,
        "SPARK_GRAFT_BENCH_REPS": str(reps),
        "SPARK_GRAFT_BENCH_OUT": out_json,
    })
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=repo_root, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if r.returncode != 0 or not os.path.exists(out_json):
        return None
    with open(out_json) as f:
        doc = json.load(f)
    # graft.Bench runs its fixed control pair (scan-bound q6 +
    # write-bound synthetic repartition) before and after the query by
    # default, so every isolated run carries its own same-JVM box-state
    # stamp; mover triage must quote the control MATCHING the mover's
    # bound (r13: scan controls under-state write degradation)
    return doc.get("queries", {}).get(name), doc.get("controls", {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("new_sweep")
    ap.add_argument("old_sweep")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.2)
    ap.add_argument("--run", metavar="SFDIR", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out-dir", default="/tmp/isolated_movers")
    args = ap.parse_args()

    new = load_queries(args.new_sweep)
    old = load_queries(args.old_sweep)
    mv = movers(new, old, args.threshold, args.min_sec)
    if not mv:
        print(f"no movers >= {args.threshold}x (min {args.min_sec}s) "
              f"among {len(new)} queries")
        return 0

    print(f"{len(mv)} mover(s) >= {args.threshold}x in-sweep:")
    for name, osec, nsec, ratio in mv:
        print(f"  {name}: {osec:.2f}s -> {nsec:.2f}s ({ratio:.2f}x)")

    if not args.run:
        print("\n(re-run with --run SFDIR to isolate each in a fresh JVM)")
        return 0

    os.makedirs(args.out_dir, exist_ok=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    failures = 0
    print(f"\nisolated min-of-{args.reps}, one JVM per query, sf={args.run}:")
    print("| query | old sweep | new sweep | in-sweep ratio | isolated "
          "| ctl scan pre/post | ctl write pre/post |")
    print("|---|---|---|---|---|---|---|")
    for name, osec, nsec, ratio in mv:
        res = run_isolated(name, args.run, args.reps, args.out_dir, repo_root)

        def pair(ctl, kind):
            a, b = ctl.get(f"{kind}_pre"), ctl.get(f"{kind}_post")
            if a is None or b is None:
                return "-"
            return f"{a:.2f}/{b:.2f}"

        if res is None or res[0] is None:
            failures += 1
            # a query failure with healthy controls is a query bug; a
            # failure with degraded controls is box state — print
            # whatever controls the per-query JSON returned so the
            # FAILED row still triages
            ctl = res[1] if res is not None and len(res) > 1 and res[1] else {}
            print(f"| {name} | {osec:.2f} | {nsec:.2f} | {ratio:.2f}x | "
                  f"FAILED | {pair(ctl, 'scan')} | {pair(ctl, 'write')} |")
        else:
            iso, ctl = res
            print(f"| {name} | {osec:.2f} | {nsec:.2f} | {ratio:.2f}x | "
                  f"{iso:.2f} s | {pair(ctl, 'scan')} | {pair(ctl, 'write')} |")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
