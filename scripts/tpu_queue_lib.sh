# Shared TPU measurement-queue helpers (sourced by scripts/tpu_queue_*.sh).
#
# Usage in a queue script:
#   QTAG=q6x
#   source "$(dirname "$0")/tpu_queue_lib.sh"
#   run_watched <cell-tag> <stall-secs> <wall-cap-secs> <tries> <cmd...>
#
# Contract (CLAUDE.md "TPU jobs" convention): every TPU job runs under a
# probe-and-retry watchdog because the axon tunnel wedges for hours — a
# wedged process shows futex-wait + frozen CPU time and must be killed by
# PID (never by pattern). run_watched polls /proc/<pid>/stat jiffies: if
# CPU time advances < 200 jiffies over <stall-secs> of wall (or the
# wall-cap is hit) the try is killed and retried after the tunnel probe
# goes green again. Cell stdout/stderr land in measurements/<tag>.{log,err}.
: "${QTAG:?set QTAG before sourcing tpu_queue_lib.sh}"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}

wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[$QTAG] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[$QTAG] giving up" >&2; exit 1; fi
  done
  echo "[$QTAG] tunnel up $(date +%H:%M:%S)" >&2
}

run_watched() {
  local tag="$1" stall="$2" cap="$3" tries="$4"; shift 4
  local try
  for try in $(seq 1 "$tries"); do
    wait_tunnel
    echo "[$QTAG] $tag try $try $(date +%H:%M:%S)" >&2
    "$@" > "measurements/${tag}.log" 2> "measurements/${tag}.err" &
    local pid=$!
    local prev=0 now elapsed=0 wall=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      elapsed=$((elapsed + 60)); wall=$((wall + 60))
      now=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo "")
      [ -z "$now" ] && break
      if { [ $((now - prev)) -lt 200 ] && [ "$elapsed" -ge "$stall" ]; } \
         || [ "$wall" -ge "$cap" ]; then
        echo "[$QTAG] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[$QTAG] $tag ok" >&2; return 0; }
    echo "[$QTAG] $tag retrying" >&2
  done
  echo "[$QTAG] $tag FAILED" >&2
  return 1
}
