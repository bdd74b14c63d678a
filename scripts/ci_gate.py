#!/usr/bin/env python3
"""CI gate: the full test suite, sharded across a few pytest processes.

Why not one ``python -m pytest tests -q`` process: this jaxlib's XLA:CPU
compiler segfaults (exit 139/134) non-deterministically after a few
hundred compilations in a single process — reproduced three times in
rounds 4/5, each time inside ``backend_compile_and_load`` (or the
compile-cache read/write wrappers around it) while compiling a large
executable late in the run (test_t2v_eval_hooks' generate_t2v scan, or
test_tta's train step). The same tests pass in isolation, warm or cold,
and disabling the persistent compile cache entirely
(``jax_enable_compilation_cache=False``) moved the crash from the cache
serialize/deserialize frames into the compiler proper — so it is
compiler-process state, not our code and not the cache. Details in
ARCHITECTURE.md "Environment / hardware notes".

The gate therefore partitions test files into ``--shards`` sequential
pytest subprocesses (size-balanced round-robin, ~50-100 XLA compiles
each — well under the observed crash horizon), aggregates, and exits
nonzero if ANY shard fails, crashes, or collects nothing. File list is
globbed at runtime: a new test file is automatically in the gate.

Usage:
    python scripts/ci_gate.py [--shards 7] [--timeout 3600] [-k EXPR]
"""

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAIL_RE = re.compile(
    r"(\d+) (passed|failed|error|errors|skipped|xfailed|xpassed|"
    r"deselected|warnings?)")


def parse_counts(tail: str):
    counts = {}
    for line in tail.splitlines()[::-1]:
        if ("passed" in line or "failed" in line or "error" in line
                or "no tests ran" in line):
            for n, kind in TAIL_RE.findall(line):
                counts[kind.rstrip("s") if kind in ("errors", "warnings")
                       else kind] = counts.get(kind, 0) + int(n)
            if counts:
                break
    return counts


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shards", type=int, default=7)
    p.add_argument("--timeout", type=int, default=3600,
                   help="per-shard timeout (s)")
    p.add_argument("-k", default=None, help="pytest -k filter")
    p.add_argument("--log-dir", default="/tmp/ci_gate")
    args = p.parse_args(argv)

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if not files:
        print("ci_gate: no test files found", file=sys.stderr)
        return 2
    # size-balanced round-robin: big (compile-heavy) files spread out
    files.sort(key=os.path.getsize, reverse=True)
    shards = [[] for _ in range(min(args.shards, len(files)))]
    for i, f in enumerate(files):
        shards[i % len(shards)].append(f)

    os.makedirs(args.log_dir, exist_ok=True)
    t0 = time.time()
    totals, failures = {}, []
    for i, shard in enumerate(shards):
        cmd = [sys.executable, "-m", "pytest", "-q", *shard]
        if args.k:
            cmd += ["-k", args.k]
        log = os.path.join(args.log_dir, f"shard{i}.log")
        ts = time.time()
        with open(log, "w") as fh:
            try:
                rc = subprocess.run(
                    cmd, stdout=fh, stderr=subprocess.STDOUT, cwd=REPO,
                    timeout=args.timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -9
                fh.write(f"\nci_gate: shard timed out after "
                         f"{args.timeout}s\n")
        tail = open(log).read()[-4000:]
        counts = parse_counts(tail)
        for k, v in counts.items():
            totals[k] = totals.get(k, 0) + v
        names = ",".join(os.path.basename(f)[5:-3] for f in shard)
        status = "ok" if rc == 0 else f"FAIL rc={rc}"
        print(f"[shard {i}] {status} {counts or '(no summary)'} "
              f"{time.time() - ts:.0f}s  ({names})", flush=True)
        if rc != 0:
            failures.append((i, rc, log))
            print(tail[-2000:], flush=True)

    verdict = "GREEN" if not failures else "RED"
    print(f"ci_gate: {verdict} {totals} in {time.time() - t0:.0f}s "
          f"({len(shards)} shards)")
    if failures:
        for i, rc, log in failures:
            print(f"  shard {i} rc={rc}: {log}")
        return 1
    if not totals.get("passed"):
        print("ci_gate: nothing passed — collection problem?")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
