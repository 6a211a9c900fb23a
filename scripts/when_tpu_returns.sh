#!/bin/bash
# On-chip validation battery for when the axon tunnel comes back.
# Polls backend init; once it succeeds, runs the verify drive, the round
# bench, and the profiles, logging everything to /tmp/tpu_battery.log.
#
# Lock discipline (round 5): the single-chip lock is taken PER STAGE, not
# for the whole battery — between stages the driver's end-of-round
# bench.py can grab the chip instead of timing out against a lock held
# for hours (round-4 weak #6). Concurrent clients still never overlap
# (two clients of the remote runtime deadlock in the compile queue,
# observed). The bench stage runs SYN3R_BENCH_THOROUGH=1 and writes its
# result through bench.py's BENCH_LAST_GOOD record, so a later driver run
# can emit a fresh dated number immediately even if the chip is busy.
set -u
LOG=/tmp/tpu_battery.log
LOCK=/tmp/syn3r_tpu.lock
cd /root/repo

probe() {
    timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
jax.devices()
EOF
}

stage() {  # stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "[battery] === $name ===" >> "$LOG"
    # bounded lock wait (-w): a wedged lock holder (e.g. a client that
    # died mid-tunnel-outage while holding the lock's fd) must skip the
    # stage, not hang the whole battery forever
    flock -w 900 "$LOCK" timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "[battery] $name exit: $?" >> "$LOG"
}

echo "[battery] start $(date -u)" >> "$LOG"
for i in $(seq 1 200); do
    if probe; then
        echo "[battery] tunnel UP at $(date -u) (attempt $i)" >> "$LOG"
        break
    fi
    echo "[battery] attempt $i down $(date -u)" >> "$LOG"
    sleep 240
done
if ! probe; then
    echo "[battery] gave up $(date -u)" >> "$LOG"
    exit 1
fi

stage "verify drive" 3600 python .claude/skills/verify/drive.py

echo "[battery] === bench ===" >> "$LOG"
flock -w 900 "$LOCK" env SYN3R_BENCH_LOCK_SKIP=1 SYN3R_BENCH_THOROUGH=1 \
    timeout 5400 python bench.py > /tmp/bench_battery.json 2>> "$LOG"
echo "[battery] bench exit: $?" >> "$LOG"
cat /tmp/bench_battery.json >> "$LOG"

stage "gs profile" 1800 python scripts/profile_gs_step.py
stage "unet component profile" 3600 python scripts/profile_unet_step.py
stage "pallas kernel A/B (FFN x NORMS flags)" 5400 python scripts/ab_flags.py

# NB: keep the inherited PYTHONPATH entries — /root/.axon_site is how the
# axon TPU plugin registers; overwriting PYTHONPATH kills backend init.
# (Append-only expansion: no trailing colon when PYTHONPATH is unset —
# an empty entry would put CWD on sys.path, ADVICE r4.)
echo "[battery] === LLFF protocol evidence run ===" >> "$LOG"
flock -w 900 "$LOCK" env PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH} \
    timeout 5400 python .claude/skills/verify/protocol_run.py >> "$LOG" 2>&1
echo "[battery] protocol exit: $?" >> "$LOG"
echo "[battery] done $(date -u)" >> "$LOG"
