#!/bin/bash
# Round-5 TPU work orchestrator, relay-outage-proof.
#
# The axon relay can go down for tens of minutes (ROADMAP 2026-08-20
# incident). The stage supervisors (run_horizon.sh, run_n8192_approx.sh)
# give up after two no-progress restarts — correct for a real crash loop,
# fatal during a long outage. This outer loop relaunches the current stage
# only when a bounded relay probe succeeds, so a give-up during an outage
# costs nothing and a healthy relay always resumes the pipeline:
#
#   stage 1: horizon campaign to epoch 10000 + held-out eval (run_horizon.sh)
#   stage 2: N=8192 --knn_mode approx quality A/B    (run_n8192_approx.sh)
#
# Adopts an already-running stage supervisor via ADOPT_PID (never
# double-launches). Stages are detected done by their output artifacts.
#
#   ADOPT_PID=<pid> nohup bash scripts/babysit_r5.sh > /tmp/babysit_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

PID=${ADOPT_PID:-}

relay_live() {
    timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

horizon_done() {
    [ -s runs/final_eval_horizon/horizon_ckpt_epoch_10000.json ] \
        && [ -s runs/final_eval_horizon/horizon_ckpt_best.json ]
}

approx_done() {
    [ -s runs/final_eval_n8192_approx_ckpt_epoch_500.json ]
}

while :; do
    if [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; then
        sleep 180
        continue
    fi
    PID=""
    if horizon_done && approx_done; then
        echo "[babysit] all stages done at $(date)"
        break
    fi
    if ! relay_live; then
        echo "[babysit] relay down at $(date); waiting"
        sleep 120
        continue
    fi
    if ! horizon_done; then
        echo "[babysit] (re)launching run_horizon.sh at $(date)"
        setsid nohup bash scripts/run_horizon.sh >> /tmp/horizon.log 2>&1 &
        PID=$!
    else
        echo "[babysit] (re)launching run_n8192_approx.sh at $(date)"
        setsid nohup bash scripts/run_n8192_approx.sh >> /tmp/n8192_approx.log 2>&1 &
        PID=$!
    fi
    sleep 60
done
