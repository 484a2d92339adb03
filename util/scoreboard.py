#!/usr/bin/env python
"""Golden-parity scoreboard over the reference regression suites.

Runs every reference input through our orchestration in a subprocess
(CPU, float64, per-case timeout) and FP-diffs the result against the
committed reference log (ref: tests/test-diff.sh semantics).  Writes
SCOREBOARD.json and prints a summary table.

Usage: python util/scoreboard.py [--suite d3q19-short] [--only PREFIX]
                                 [--timeout SECS] [--mode full(default)|stats]
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Cases nobody can run from the reference tree as committed (the input
# needs a data file that was never committed); see ORACLE.md Finding 4.
UNRUNNABLE = {
    "d3q19/long08-pair-yk1":
        "colloid data file colloids-serial-pair-yk1.001-001 was never "
        "committed to the reference; the reference itself cannot re-run "
        "this case (ORACLE.md Finding 4)",
}

CHILD = r"""
import sys
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the big colloid/LC programs compile in
# minutes on one CPU; identical reruns then load in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
name, mode, workdir = sys.argv[1:4]
from ludwig_tpu.utils.golden import check_case
try:
    ok, diffs, out = check_case(name, mode=mode, workdir=workdir)
    print("RESULT", json.dumps({"ok": ok, "ndiff": len(diffs),
                                "diffs": diffs[:12]}))
except Exception as e:
    print("RESULT", json.dumps({"ok": False, "error":
                                f"{type(e).__name__}: {e}"[:300]}))
"""


def run_case(name, mode, timeout, workdir):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    xf = env.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in xf:
        # no FMA contraction: jitted runs match the reference bitwise
        env["XLA_FLAGS"] = (xf + " --xla_cpu_max_isa=SSE4_2").strip()
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import json\n" + CHILD,
             name, mode, workdir],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[7:])
                res["secs"] = round(time.time() - t0, 1)
                return res
        return {"ok": False, "error": "no result: "
                + (p.stderr.strip().splitlines() or ["?"])[-1][:200],
                "secs": round(time.time() - t0, 1)}
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": f"timeout {timeout}s",
                "secs": timeout}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="d3q19-short")
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--out", default=os.path.join(REPO, "SCOREBOARD.json"))
    ap.add_argument("--rerun", action="store_true",
                    help="re-run cases already on the scoreboard")
    ap.add_argument("--failing", action="store_true",
                    help="re-run only cases currently failing on the "
                    "scoreboard")
    args = ap.parse_args()

    suite_dir = f"/root/reference/tests/regression/{args.suite}"
    # d3q19-short keeps bare keys (the original board); other suites
    # get suite-qualified keys because several case names collide
    # across suites (e.g. serial-auto-c01 in d3q19-short AND d3q15).
    prefix = "" if args.suite == "d3q19-short" else args.suite + "/"
    names = sorted(prefix + os.path.splitext(os.path.basename(p))[0]
                   for p in glob.glob(os.path.join(suite_dir, "*.inp")))
    if args.only:
        names = [n for n in names if args.only in n]
    if args.failing:
        with open(args.out) as fh:
            prev = json.load(fh)
        names = [n for n in names
                 if n in prev and not prev[n].get("ok")]
        args.rerun = True

    board = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            board = json.load(fh)

    if not args.rerun:
        names = [n for n in names if n not in board]

    import tempfile
    npass = 0
    for i, name in enumerate(names):
        if name in UNRUNNABLE:
            board[name] = {"ok": False, "skipped": True,
                           "error": "unrunnable-as-distributed: "
                           + UNRUNNABLE[name], "secs": 0}
            print(f"[{i+1}/{len(names)}] {name}: SKIP (unrunnable)",
                  flush=True)
            with open(args.out, "w") as fh:
                json.dump(board, fh, indent=1, sort_keys=True)
            continue
        with tempfile.TemporaryDirectory() as wd:
            res = run_case(name, args.mode, args.timeout, wd)
        board[name] = res
        npass += bool(res.get("ok"))
        status = ("PASS" if res.get("ok")
                  else res.get("error", f"{res.get('ndiff')} diffs")[:60])
        print(f"[{i+1}/{len(names)}] {name}: {status} ({res['secs']}s)",
              flush=True)
        with open(args.out, "w") as fh:
            json.dump(board, fh, indent=1, sort_keys=True)

    total_pass = sum(bool(v.get("ok")) for v in board.values())
    print(f"\nThis run: {npass}/{len(names)}  |  "
          f"Scoreboard total: {total_pass}/{len(board)}")


if __name__ == "__main__":
    main()
