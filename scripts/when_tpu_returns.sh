#!/bin/bash
# On-chip validation battery for when the axon tunnel comes back.
# Polls backend init; once it succeeds, runs the verify drive, the round
# bench, and the GS-step profile, logging everything to /tmp/tpu_battery.log.
set -u
LOG=/tmp/tpu_battery.log
cd /root/repo

probe() {
    timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
jax.devices()
EOF
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

# hold the single-chip lock for the whole battery: concurrent clients of
# the tunnel deadlock in the remote compile queue; bench.py (the driver's
# end-of-round run) waits on this same lock and falls back to its last
# recorded result if the battery holds it too long.
exec 9>/tmp/syn3r_tpu.lock
flock 9
echo "[battery] holding /tmp/syn3r_tpu.lock" >> "$LOG"

echo "[battery] === verify drive ===" >> "$LOG"
timeout 3600 python .claude/skills/verify/drive.py >> "$LOG" 2>&1
echo "[battery] drive exit: $?" >> "$LOG"

echo "[battery] === bench ===" >> "$LOG"
SYN3R_BENCH_LOCK_SKIP=1 timeout 5400 python bench.py > /tmp/bench_r3.json 2>> "$LOG"
echo "[battery] bench exit: $?" >> "$LOG"
cat /tmp/bench_r3.json >> "$LOG"

echo "[battery] === gs profile ===" >> "$LOG"
timeout 1800 python scripts/profile_gs_step.py >> "$LOG" 2>&1
echo "[battery] profile exit: $?" >> "$LOG"

echo "[battery] === unet component profile ===" >> "$LOG"
timeout 3600 python scripts/profile_unet_step.py >> "$LOG" 2>&1
echo "[battery] unet profile exit: $?" >> "$LOG"

echo "[battery] === pallas kernel A/B (FFN x NORMS flags) ===" >> "$LOG"
timeout 5400 python scripts/ab_flags.py >> "$LOG" 2>&1
echo "[battery] ab exit: $?" >> "$LOG"

echo "[battery] === LLFF protocol evidence run ===" >> "$LOG"
# NB: keep the inherited PYTHONPATH entries — /root/.axon_site is how the
# axon TPU plugin registers; overwriting PYTHONPATH kills backend init.
PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 5400 \
    python .claude/skills/verify/protocol_run.py >> "$LOG" 2>&1
echo "[battery] protocol exit: $?" >> "$LOG"
echo "[battery] done $(date -u)" >> "$LOG"
