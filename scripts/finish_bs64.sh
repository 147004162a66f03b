#!/bin/bash
# bs=64 campaign endgame (reference configs[1] regime: Chair trains at
# bs=64, /root/reference/Generation/config.py:36-41 — run here on the
# synthetic family at sample-exposure parity with the bs=24 r3b control:
# 3500 epochs x 37 steps x 64 = 8.3M samples vs 330k x 24 = 7.9M).
#
#   1. wait for / resume the campaign to epoch 3500 (watchdog rc=42 retry)
#   2. held-out final eval (best-EMA-MMD + final checkpoints, EMA weights,
#      disjoint-seed reference draw) -> runs/final_eval_bs64/*.json
#   3. serving probe rerun with the TPU free (scan vs loop vs bf16 wire)
#
# Stages skip instantly if their outputs already exist, so the script is
# rerunnable after any interruption.
set -u
cd "$(dirname "$0")/.."

DIR=runs/campaign_bs64
FINAL=3500

# --- stage 1: campaign to horizon --------------------------------------
# if a campaign process is already running in $DIR (pid recorded by the
# launcher), wait for it instead of double-launching (two writers would
# corrupt the run dir)
if [ -f /tmp/campaign_bs64.pid ]; then
    while kill -0 "$(cat /tmp/campaign_bs64.pid)" 2>/dev/null; do sleep 60; done
fi
if [ ! -f "$DIR/ckpt_epoch_${FINAL}.pkl" ]; then
    while :; do
        python scripts/campaign.py --bs 64 --log_dir "$DIR" --restore \
            --max_epoch "$FINAL"
        rc=$?
        [ "$rc" -ne 42 ] && break
        echo "[finish_bs64] watchdog restart (rc=42)" >&2
        sleep 30
    done
    [ -f "$DIR/ckpt_epoch_${FINAL}.pkl" ] \
        || { echo "[finish_bs64] FATAL: campaign did not reach ${FINAL}" >&2; exit 1; }
fi

# --- stage 2: held-out final eval ---------------------------------------
mkdir -p runs/final_eval_bs64
CKPTS=$(python - <<'PY'
import json, os
best, best_v = None, 1e9
with open("runs/campaign_bs64/eval.jsonl") as f:
    for i, line in enumerate(f, 1):
        try:
            r = json.loads(line)
        except ValueError:
            import sys; print(f"skip malformed eval.jsonl:{i}", file=sys.stderr)
            continue
        v = r.get("ema", {}).get("MMD-CD")
        ck = f"runs/campaign_bs64/ckpt_epoch_{r.get('epoch')}.pkl"
        if v is not None and v < best_v and os.path.exists(ck):
            best, best_v = ck, v
out = [p for p in (best, "runs/campaign_bs64/ckpt_epoch_3500.pkl")
       if p and os.path.exists(p)]
print("\n".join(dict.fromkeys(out)))
PY
) || { echo "[finish_bs64] FATAL: checkpoint selection failed" >&2; exit 1; }
for ck in $CKPTS; do
    tag=bs64_$(basename "$ck" .pkl)
    if [ ! -s "runs/final_eval_bs64/$tag.json" ]; then
        echo "[finish_bs64] eval $ck -> $tag" >&2
        timeout 3600 python evaluate.py --log_dir "$DIR" \
            --ckpt "$ck" --ema --n 96 --ref runs/heldout_ref.npy \
            --normalize --emd > "runs/final_eval_bs64/$tag.json" \
            || echo "[finish_bs64] FAILED $ck" >&2
    fi
done

# --- stage 3: serving probe with the TPU free ----------------------------
if [ ! -s runs/probe_manip_wire.jsonl ]; then
    timeout 1800 python scripts/probe_manip_scan.py \
        > runs/probe_manip_wire.jsonl 2>/tmp/probe_wire.err \
        || echo "[finish_bs64] serving probe FAILED" >&2
fi
echo "[finish_bs64] done" >&2
