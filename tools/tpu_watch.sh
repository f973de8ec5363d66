#!/bin/bash
# Tunnel-return watcher (VERDICT r03 item 2).
#
# The axon TPU tunnel has a history of coming back for windows shorter than a
# round: up at r01's driver capture, down for r02's, down all of r03.  Manual
# polling missed two capture windows, so this script automates the harvest:
# probe the backend every PROBE_INTERVAL seconds (default 240), and on the
# FIRST successful probe run the full revalidation playbook
# (tools/tpu_revalidate.sh: Mosaic smoke -> on-chip exactness -> per-stage
# profile -> headline bench -> config benches), copy every artifact into the
# repo under docs/reval_r04/, and commit them.
#
# Probe history: /tmp/tpu_watch.log (one line per probe; committed alongside
# the artifacts as docs/reval_r04/watch.log on success).
#
# Usage:  nohup bash tools/tpu_watch.sh &   (or as a background task)
# Stop:   kill $(cat /tmp/tpu_watch.pid)
set -u
cd /root/repo
echo $$ > /tmp/tpu_watch.pid
LOG=/tmp/tpu_watch.log
INTERVAL="${PROBE_INTERVAL:-240}"
DEST=docs/reval_r04

probe() {
  # Backend init HANGS (no error) when the tunnel is down -> timeout is the
  # only reliable down-detector.  A short jit round-trip confirms it's live
  # end to end, not just that device enumeration succeeded.
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()[0]
assert d.platform != "cpu"
x = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(256, dtype=jnp.int32))
assert int(x) == 65536 + 256
EOF
}

while true; do
  if probe; then
    echo "$(date -u +%FT%TZ) UP - firing revalidation" >> "$LOG"
    bash tools/tpu_revalidate.sh >> "$LOG" 2>&1
    rc=$?
    mkdir -p "$DEST"
    cp -f /tmp/tpu_reval/*.log "$DEST"/ 2>/dev/null
    cp -f "$LOG" "$DEST"/watch.log
    git add "$DEST" BENCH_CONFIGS_r04.json 2>/dev/null
    # path-scoped commit: never sweeps up unrelated staged work
    git commit -m "On-chip revalidation artifacts (tunnel-return watcher, rc=$rc)" \
      -- "$DEST" BENCH_CONFIGS_r04.json >> "$LOG" 2>&1
    echo "$(date -u +%FT%TZ) revalidation done rc=$rc" >> "$LOG"
    # A mid-run tunnel flap leaves rc!=0 with partial logs: keep watching and
    # retry on the next window instead of abandoning the watch.
    if [ "$rc" -eq 0 ]; then
      exit 0
    fi
    echo "$(date -u +%FT%TZ) revalidation failed (rc=$rc) - resuming watch" >> "$LOG"
  else
    echo "$(date -u +%FT%TZ) DOWN (probe timeout/fail)" >> "$LOG"
  fi
  sleep "$INTERVAL"
done
