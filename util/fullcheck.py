#!/usr/bin/env python
"""Init-surface parity dev loop for full-log (test-diff.sh) mode.

Runs golden inputs with N_cycles=0 (init only, cheap) and FP-diffs the
filtered init section (everything before "Starting time step loop.")
against the committed reference log.  This is the fast inner loop for
bringing up the non-statistics log surface; the slow outer validation
is `python util/scoreboard.py --mode full --rerun`.

Usage: python util/fullcheck.py [--only SUBSTR] [--suite NAME|all]
                                [--show N] [-j N]
"""

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUITES = ("d3q19-short", "d2q9", "d3q15", "d3q27", "d3q19-elec",
          "d3q19-io", "d3q19")

CHILD = r"""
import io, json, os, sys
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_enable_x64", True)
os.environ["LTP_INIT_ONLY"] = "1"
name, workdir = sys.argv[1:3]
from ludwig_tpu.utils.golden import find_case, run_case
from ludwig_tpu.utils.fpdiff import filter_lines, fp_diff
_, log = find_case(name)
ref = open(log).read().split("Initial conditions.")[0]
try:
    os.makedirs(workdir, exist_ok=True)
    out = run_case(name, workdir=workdir, strict_fp=True, n_cycles=0)
    out = out.split("Initial conditions.")[0]
    diffs = fp_diff(filter_lines(ref), filter_lines(out))
    print("RESULT", json.dumps({"ok": not diffs, "ndiff": len(diffs),
                                "diffs": diffs[:400]}))
except Exception as e:
    import traceback
    tb = traceback.format_exc().splitlines()[-3:]
    print("RESULT", json.dumps({"ok": False,
                                "error": f"{type(e).__name__}: {e}"[:300],
                                "tb": tb}))
"""


def run_one(name):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    wd = os.path.join("/tmp/fullcheck", name.replace("/", "_"))
    try:
        p = subprocess.run([sys.executable, "-c", CHILD, name, wd],
                           capture_output=True, text=True, timeout=600,
                           cwd=REPO, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[7:])
        return {"ok": False, "error": "no result: " +
                (p.stderr.strip().splitlines() or ["?"])[-1][:200]}
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--suite", default="all")
    ap.add_argument("--show", type=int, default=30,
                    help="diff lines to display per failing case")
    ap.add_argument("--max-cases", type=int, default=0)
    ap.add_argument("-j", type=int, default=4)
    args = ap.parse_args()

    suites = SUITES if args.suite == "all" else (args.suite,)
    names = []
    for s in suites:
        d = f"/root/reference/tests/regression/{s}"
        pre = "" if s == "d3q19-short" else s + "/"
        names += sorted(pre + os.path.splitext(os.path.basename(p))[0]
                        for p in glob.glob(os.path.join(d, "*.inp")))
    if args.only:
        names = [n for n in names if args.only in n]
    if args.max_cases:
        names = names[:args.max_cases]

    from concurrent.futures import ThreadPoolExecutor
    results = {}
    with ThreadPoolExecutor(max_workers=args.j) as exe:
        futs = {exe.submit(run_one, n): n for n in names}
        for fut in futs:
            pass
        done = 0
        import concurrent.futures as cf
        for fut in cf.as_completed(futs):
            n = futs[fut]
            results[n] = fut.result()
            done += 1
            r = results[n]
            status = ("OK" if r.get("ok")
                      else r.get("error", f"{r.get('ndiff')} diffs"))
            print(f"[{done}/{len(names)}] {n}: {status}", flush=True)

    fails = {n: r for n, r in results.items() if not r.get("ok")}
    print(f"\ninit parity: {len(results) - len(fails)}/{len(results)}")
    for n in sorted(fails, key=lambda k: fails[k].get("ndiff", 9999)):
        r = fails[n]
        print(f"\n=== {n}: "
              f"{r.get('error', str(r.get('ndiff')) + ' diffs')} ===")
        for d in r.get("diffs", [])[:args.show]:
            print(" ", d)
        for t in r.get("tb", []):
            print(" ", t)


if __name__ == "__main__":
    main()
