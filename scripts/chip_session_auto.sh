#!/bin/bash
# Automated chip-session runner (docs/CHIP_SESSION.md, round-4 hardware items).
#
# The tunneled TPU has been unreachable for hours at a stretch; this script
# waits for it and then executes the runbook steps shortest-first, so an
# unattended tunnel window still yields verdicts.  Each step writes its JSON
# to $STATE and gets a .done marker only if the output parses; a crashed or
# flaked step is retried on the next pass (max $MAX_PASSES).  Steps re-probe
# the backend between runs so one mid-session outage costs one step.
#
# Usage:  bash scripts/chip_session_auto.sh &  (bounded: exits after DEADLINE)
# Pause:  touch /tmp/host_busy   (e.g. while pytest owns the single core)
set -u
REPO=/root/repo
STATE=/tmp/chip_auto
LOG=$STATE/runner.log
DEADLINE=$(( $(date +%s) + 11 * 3600 ))   # give up after 11 h
MAX_PASSES=8
PROBE_SLEEP=420                            # between failed probes (7 min)
export PYTHONPATH=$REPO:/root/.axon_site
mkdir -p "$STATE"
cd "$REPO"

say() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

probe() {
  timeout 300 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
print("PROBE OK", d[0].platform, float((x @ x)[0, 0].astype(jnp.float32)))
EOF
}

wait_for_chip() {
  while :; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
    while [ -e /tmp/host_busy ]; do
      [ "$(date +%s)" -ge "$DEADLINE" ] && return 1   # stay bounded
      say "host busy; waiting"; sleep 300
    done
    if probe; then say "probe ok"; return 0; fi
    say "probe failed; sleeping ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

# run <name> <timeout_s> <cmd...>: stdout -> $STATE/<name>.json, done-marker
# only when the command exits 0 AND its last stdout line parses as JSON
# (trainer steps also print human progress lines above the JSON) AND the
# JSON is not bench.py's fail-soft zero record (backend "unavailable",
# value 0.0) — that parses fine but is exactly what the runner must retry,
# not archive as hardware evidence.
run_step() {
  name=$1; tmo=$2; shift 2
  [ -e "$STATE/$name.done" ] && return 0
  wait_for_chip || return 1
  say "step $name: starting ($*)"
  timeout "$tmo" "$@" > "$STATE/$name.json" 2>> "$LOG"
  rc=$?
  if [ "$rc" -eq 0 ] && python - "$STATE/$name.json" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]).read().splitlines() if l.strip()]
assert lines, "empty output"
rec = json.loads(lines[-1])
if isinstance(rec, dict):
    assert rec.get("backend") != "unavailable", "fail-soft record, retry"
    assert rec.get("value") != 0.0, "zero result, retry"
EOF
  then
    touch "$STATE/$name.done"
    # mirror into the repo so results survive even if no session is alive
    # to process them (the round driver commits the working tree at the end)
    mkdir -p "$REPO/docs/runs/chip_auto"
    cp "$STATE/$name.json" "$REPO/docs/runs/chip_auto/$name.json"
    say "step $name: DONE"
  else
    say "step $name: FAILED (rc=$rc); will retry next pass"
  fi
  return 0
}

say "runner start (deadline in 11h)"
pass=0
while [ "$pass" -lt "$MAX_PASSES" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  pass=$((pass + 1))
  say "=== pass $pass ==="
  # 5100 > bench.py's internal retry deadline (LIGHT_UNET_BENCH_DEADLINE,
  # 4800 s): the supervisor must be able to finish its own retries and print
  # the fail-soft JSON before the outer timeout SIGTERMs it mid-attempt.
  run_step bench_r4      5100 python bench.py                                   || break
  run_step linkopt_sparse 1800 python scripts/bench_link_opts.py --which sparse || break
  run_step linkopt_mask  1800 python scripts/bench_link_opts.py --which mask    || break
  run_step linkopt_pbatch 2400 python scripts/bench_link_opts.py --which pbatch || break
  run_step linkopt_chain 3600 python scripts/bench_link_opts.py --which chain   || break
  run_step linkopt_tail  1800 python scripts/bench_link_opts.py --which tail    || break
  run_step hard_chip     5400 python scripts/synthetic_training_run.py --hard \
      --epochs 40 --n-train 12 --n-val 5 --shape 96 96 120 --batch 8 \
      --validate-every 1 --scheduler plateau --plateau-patience 4 \
      --early-patience 10 --lr 1e-3 --out "$STATE/hard_chip_run.json"           || break
  ls "$STATE"/*.done 2>/dev/null | wc -l | grep -q '^7$' && { say "all steps done"; exit 0; }
  sleep 60
done
say "runner exit (pass=$pass)"
