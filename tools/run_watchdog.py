"""Stall watchdog for long TPU runs through the axon tunnel.

The tunnel's execute/fetch path wedges for minutes-to-hours at a time
(observed across rounds 2-4: `jax.devices()` still answers while any
dispatch or host fetch hangs forever; a worker blocked this way never
recovers even after the tunnel does, because its in-flight RPC is lost).
Round 3 lost a multi-hour quality run to exactly this. This wrapper makes
long runs self-healing, the infra-level counterpart of the in-training NaN
recovery (SURVEY.md section 5.3):

- launch the payload command in its own process GROUP (never pattern-kill:
  killing is by the group id we created);
- watch the payload's log file; while it advances, do nothing;
- if the log goes stale for --stall_sec, run a BOUNDED data-path probe
  (tiny matmul + host fetch in a throwaway process). A slow-but-alive
  tunnel (long compile) passes the probe -> keep waiting up to
  --hard_stall_sec. A wedged tunnel times the probe out -> kill the
  payload group, poll until a probe succeeds, relaunch;
- payloads must be resumable (quality_curves.py / real_faces_run.py resume
  finished stages by checkpoint; mid-stage, StageRunner restarts from the
  stage's last checkpoint).

    python tools/run_watchdog.py --log /tmp/qc.log --max_restarts 20 -- \
        python tools/quality_curves.py --work /tmp/qc --train_log /tmp/qc.log ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

PROBE = ("import jax.numpy as jnp; "
         "x = jnp.ones((128, 128)); print('probe-ok', float((x @ x).sum()))")


def probe_tunnel(timeout_sec: int) -> bool:
    """True iff a fresh process can dispatch AND fetch within the budget."""
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, timeout=timeout_sec)
        return b"probe-ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def log_mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def kill_group(proc: subprocess.Popen) -> None:
    """SIGTERM then SIGKILL the payload's own process group (created via
    start_new_session; this can never match unrelated processes)."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, 10), (signal.SIGKILL, 5)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        t0 = time.time()
        while proc.poll() is None and time.time() - t0 < grace:
            time.sleep(0.5)
        if proc.poll() is not None:
            return


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log", required=True,
                   help="file the payload appends to while healthy (its "
                   "--train_log); staleness of this file is the stall signal")
    p.add_argument("--stall_sec", type=int, default=900,
                   help="log staleness that triggers a tunnel probe")
    p.add_argument("--hard_stall_sec", type=int, default=4800,
                   help="staleness after which the payload is restarted even "
                   "if probes pass (covers a hung worker on a healthy "
                   "tunnel; > the longest compile seen through the tunnel)")
    p.add_argument("--probe_timeout", type=int, default=240)
    p.add_argument("--recheck_sec", type=int, default=60)
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- payload command")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no payload command given")

    restarts = 0
    while True:
        print(f"[watchdog] launch (restart #{restarts}): {' '.join(cmd)}",
              flush=True)
        proc = subprocess.Popen(cmd, start_new_session=True)
        # Staleness baselines at THIS launch, not the log's absolute mtime:
        # after an outage longer than hard_stall_sec, a freshly relaunched
        # payload must get its full first-compile budget before the old log's
        # age can count against it (advisor round-4 medium finding).
        launch_time = time.time()
        stalled_since = 0.0
        while True:
            time.sleep(args.recheck_sec)
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    print("[watchdog] payload completed", flush=True)
                    return 0
                print(f"[watchdog] payload exited rc={rc}", flush=True)
                break  # restart (bounded below)
            stale = time.time() - max(log_mtime(args.log), launch_time)
            if stale < args.stall_sec:
                stalled_since = 0.0
                continue
            if not stalled_since:
                stalled_since = time.time()
            print(f"[watchdog] log stale {stale:.0f}s; probing tunnel",
                  flush=True)
            if probe_tunnel(args.probe_timeout):
                # Tunnel alive: long compile or hung worker. Only the hard
                # limit distinguishes them.
                if stale < args.hard_stall_sec:
                    print("[watchdog] probe OK; assuming long compile",
                          flush=True)
                    continue
                print("[watchdog] probe OK but log stale past hard limit; "
                      "restarting payload", flush=True)
            else:
                print("[watchdog] probe TIMED OUT: tunnel wedged; killing "
                      "payload and waiting for recovery", flush=True)
            kill_group(proc)
            while not probe_tunnel(args.probe_timeout):
                print("[watchdog] tunnel still down; retry in 120s",
                      flush=True)
                time.sleep(120)
            print("[watchdog] tunnel recovered", flush=True)
            break
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] max restarts exceeded", flush=True)
            return 1


if __name__ == "__main__":
    raise SystemExit(main())
