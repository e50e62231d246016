#!/bin/bash
# Healthy-relay-window watcher (round 3).
#
# The TPU relay degrades for hours at a time (CLAUDE.md); the round-3
# measurement backlog (BENCH headline, SGM A/B, H2D A/B, host/multi
# profiles) all need a healthy window.  This loop probes link health every
# $PROBE_INTERVAL seconds and, the moment `diagnose` reports healthy:true,
# runs the full capture battery sequentially (one TPU client at a time),
# logging to $OUT.  Exits when the battery has run.
#
# Coordination (one-TPU-client rule): holds /tmp/dsm_tpu_busy while any
# TPU process runs; waits while /tmp/dsm_cpu_busy exists (held by
# tests/conftest.py for the duration of a pytest session, and by the
# interactive session for ad-hoc CPU-heavy runs).  bench.py kills this
# loop and its in-flight child by PIDFILE before claiming the device —
# kill the LOOP pid first (else the loop respawns the next item the
# moment the child dies), then the child.
set -u
cd /root/repo
OUT=${OUT:-/root/repo/experiments/captures}
PROBE_INTERVAL=${PROBE_INTERVAL:-900}
mkdir -p "$OUT"
echo $$ > /tmp/dsm_watch.pid
trap 'rm -f /tmp/dsm_watch.pid /tmp/dsm_watch_child.pid /tmp/dsm_tpu_busy' EXIT

probe() {
    touch /tmp/dsm_tpu_busy
    # NOT a pipeline: $! must be the python TPU client itself, so
    # bench.py's kill-by-pidfile stops the real device user
    timeout 360 python -m densesurfelmapping_tpu diagnose \
        > "$OUT/probe_raw.log" 2>/dev/null &
    echo $! > /tmp/dsm_watch_child.pid
    wait $!
    tail -1 "$OUT/probe_raw.log" > "$OUT/last_probe.json"
    rm -f /tmp/dsm_tpu_busy /tmp/dsm_watch_child.pid
    grep -q '"healthy": true' "$OUT/last_probe.json"
}

run_one() {  # name, timeout_s, cmd...
    local name=$1 tmo=$2; shift 2
    echo "=== $name $(date -u +%H:%M:%S) ===" | tee -a "$OUT/battery.log"
    touch /tmp/dsm_tpu_busy
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
    echo $! > /tmp/dsm_watch_child.pid
    wait $!
    local rc=$?
    rm -f /tmp/dsm_tpu_busy /tmp/dsm_watch_child.pid
    echo "rc=$rc" >> "$OUT/battery.log"
    tail -3 "$OUT/$name.log" >> "$OUT/battery.log"
}

while true; do
    while [ -e /tmp/dsm_cpu_busy ]; do sleep 15; done
    # another TPU client (interactive session run) holds the device:
    # wait — one client at a time (CLAUDE.md); stale >20 min is cleared
    while [ -e /tmp/dsm_tpu_busy ]; do
        age=$(( $(date +%s) - $(stat -c %Y /tmp/dsm_tpu_busy 2>/dev/null || date +%s) ))
        [ "$age" -gt 1200 ] && rm -f /tmp/dsm_tpu_busy && break
        sleep 15
    done
    ts=$(date -u +%Y-%m-%dT%H:%M:%S)
    if probe; then
        echo "$ts HEALTHY — running battery" >> "$OUT/watch.log"
        DSM_BENCH_MAX_RETRIES=0 DSM_BENCH_NO_CLAIM=1 \
            run_one bench 900 python bench.py 100
        run_one h2d_ab 900 python experiments/h2d_ab.py 200
        run_one sgm_bench 1200 python experiments/sgm_bench.py 15
        run_one host_profile 900 python experiments/host_profile.py 120
        run_one multi_profile 1200 python experiments/multi_profile.py
        # kernel-mode regression battery (VERDICT r4 #5): every Pallas
        # mode must COMPILE on real hardware (interpret-mode CPU tests
        # cannot certify Mosaic lowering — the bf16 pltpu.roll lesson),
        # and the hier / subpixel A/Bs re-measure after kernel changes
        run_one sgm_compile_check 1200 python experiments/sgm_compile_check.py
        run_one hier_ab 1200 python experiments/hier_ab.py
        run_one subpixel_ab 1200 python experiments/subpixel_ab.py
        probe && echo "post-battery still healthy" >> "$OUT/watch.log" \
              || echo "post-battery DEGRADED (discount tail items)" >> "$OUT/watch.log"
        echo "$ts battery done" >> "$OUT/watch.log"
        touch "$OUT/BATTERY_DONE"
        exit 0
    else
        echo "$ts degraded: $(cat "$OUT/last_probe.json")" >> "$OUT/watch.log"
    fi
    sleep "$PROBE_INTERVAL"
done
