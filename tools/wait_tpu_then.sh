#!/bin/bash
# Wait until the axon TPU tunnel answers, then exec the given command.
#
# The tunnel wedges for hours at a time (observed twice in round 2:
# jax.devices() hangs past 400 s; see STATUS.md / CLAUDE.md). This guard
# polls with a bounded probe per attempt and launches the payload only when
# a device list actually comes back, so long runs can be queued while the
# chip is away:
#
#   setsid nohup tools/wait_tpu_then.sh \
#     python tools/quality_curves.py --work runs/qc --max_hw 256 \
#     > /tmp/qc.log 2>&1 &
#
# Probe cost: one short-lived python per attempt (separate process, so the
# axon client's host-memory pinning never accumulates in the waiter).
PROBE_TIMEOUT="${PROBE_TIMEOUT:-300}"
RETRY_SLEEP="${RETRY_SLEEP:-120}"
echo "[wait_tpu] start $(date)" >&2
while true; do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; print(jax.devices())" \
      >/tmp/wait_tpu_probe.txt 2>&1; then
    echo "[wait_tpu] TPU up at $(date): $(tail -1 /tmp/wait_tpu_probe.txt)" >&2
    break
  fi
  echo "[wait_tpu] probe failed (rc=$?) at $(date); retry in ${RETRY_SLEEP}s" >&2
  sleep "$RETRY_SLEEP"
done
exec "$@"
