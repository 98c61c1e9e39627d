"""One-command reliable full-suite runner (VERDICT round-4 item 9).

Single-process full-suite runs can segfault inside jaxlib's XLA-CPU
backend_compile after a few hundred accumulated compilations (CLAUDE.md;
position-dependent, never test-dependent — every file passes alone). The
per-module cache clearing in tests/conftest.py shrinks the window but
cannot close it. This runner retires the flake structurally: each test
FILE runs in its own pytest subprocess, so no process ever accumulates
more than one file's compilations.

    python tools/run_tests.py             # whole tests/ tree, per-file
    python tools/run_tests.py -k ops      # only files whose name matches
    python tools/run_tests.py --pytest-args "-q -x"

Exit status is non-zero if ANY file fails, with a per-file summary table.
A file that segfaults anyway (negative returncode) is retried once in a
fresh process before being reported, mirroring the "rerun the reported
file alone — it will pass" guidance the flake historically required.
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_file(path: str, pytest_args: list[str]) -> tuple[int, float]:
    t0 = time.time()
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", path, *pytest_args], cwd=REPO
    ).returncode
    return rc, time.time() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-k", default="", help="substring filter on file names")
    p.add_argument("--pytest-args", default="-q",
                   help="extra args passed to each pytest subprocess")
    args = p.parse_args(argv)

    test_dir = os.path.join(REPO, "tests")
    files = sorted(
        f for f in os.listdir(test_dir)
        if f.startswith("test_") and f.endswith(".py") and args.k in f
    )
    if not files:
        print("no test files matched", file=sys.stderr)
        return 2

    pytest_args = shlex.split(args.pytest_args)
    results = []
    t_suite = time.time()
    for i, f in enumerate(files, 1):
        path = os.path.join("tests", f)
        print(f"\n=== [{i}/{len(files)}] {path} ===", flush=True)
        rc, dt = run_file(path, pytest_args)
        if rc < 0:
            # Crash (segfault/signal): one fresh-process retry. A genuine
            # test failure exits positive and is never retried.
            print(f"[run_tests] {f} crashed (rc={rc}); retrying once",
                  flush=True)
            rc, dt = run_file(path, pytest_args)
        results.append((f, rc, dt))

    print(f"\n{'file':40s} {'rc':>4s} {'sec':>7s}")
    failed = 0
    for f, rc, dt in results:
        mark = "ok" if rc == 0 else ("SKIP" if rc == 5 else "FAIL")
        # rc 5 = "no tests collected" (a -k/-m filter artifact, not failure)
        if rc not in (0, 5):
            failed += 1
        print(f"{f:40s} {mark:>4s} {dt:7.1f}")
    print(f"\ntotal {time.time() - t_suite:.0f}s, "
          f"{len(results)} files, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
