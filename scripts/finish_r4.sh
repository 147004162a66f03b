#!/bin/bash
# Round-4 TPU queue (after the r3 held-out eval + retry complete):
#   1. multi-class campaign (--con --cls 3, 1500 epochs = 150k steps) —
#      the configs[2] analog at campaign scale (VERDICT r3 next-round #6)
#   2. per-class + pooled held-out eval of its final checkpoint
#   3. bf16-trunk A/B probe (VERDICT r3 next-round #7): steps/s + 5000-step
#      quality probe for mixed_edge (default) vs bfloat16_g vs
#      bfloat16_tail32
# Each stage skips instantly if its output already exists; campaign stages
# retry on rc=42 (wedged device dispatch watchdog).
set -u
cd "$(dirname "$0")/.."

run_campaign() {
    local dir=$1 epochs=$2; shift 2
    while :; do
        python scripts/campaign.py --log_dir "$dir" --restore \
            --max_epoch "$epochs" "$@"
        rc=$?
        if [ "$rc" -ne 42 ]; then return "$rc"; fi
        echo "[finish_r4] watchdog restart (rc=42) in $dir" >&2
        sleep 30
    done
}

echo "[finish_r4] stage 0: large-N auction sweep" >&2
if [ ! -s runs/sweep_auction_largen.jsonl ]; then
    timeout 3600 python scripts/sweep_auction_largen.py \
        > runs/sweep_auction_largen.jsonl 2>/tmp/sweep_auction.err \
        || echo "[finish_r4] stage 0 FAILED" >&2
fi

echo "[finish_r4] stage 1: multi-class campaign -> 1500 epochs" >&2
if [ -f runs/campaign_mc/ckpt_epoch_1500.pkl ]; then
    echo "[finish_r4] stage 1 already complete" >&2
else
    run_campaign runs/campaign_mc 1500 --con --cls 3 || exit $?
fi

echo "[finish_r4] stage 2: per-class held-out eval" >&2
if [ ! -s runs/campaign_mc/final_multiclass.json ]; then
    timeout 3600 python scripts/eval_multiclass.py \
        --log_dir runs/campaign_mc \
        --ckpt runs/campaign_mc/ckpt_epoch_1500.pkl --n 96 \
        > runs/campaign_mc/final_multiclass.json \
        || echo "[finish_r4] stage 2 FAILED" >&2
fi

echo "[finish_r4] stage 3: bf16 trunk A/B probe" >&2
if [ ! -s runs/probe_bf16_r4.jsonl ]; then
    timeout 7200 python scripts/probe_quality.py --steps 5000 \
        --variants mixed_edge,bfloat16_g,bfloat16_tail32 \
        > runs/probe_bf16_r4.jsonl 2>/tmp/probe_bf16.err \
        || echo "[finish_r4] stage 3 FAILED" >&2
fi
echo "[finish_r4] stage 4: serving dtype probe" >&2
if [ ! -s runs/probe_serving_dtype.jsonl ]; then
    timeout 3600 python scripts/probe_serving_dtype.py \
        > runs/probe_serving_dtype.jsonl 2>/tmp/probe_serving.err \
        || echo "[finish_r4] stage 4 FAILED" >&2
fi

echo "[finish_r4] stage 5: N=8192 large-N campaign -> 500 epochs" >&2
if [ -f runs/campaign_n8192/ckpt_epoch_500.pkl ]; then
    echo "[finish_r4] stage 5 already complete" >&2
else
    run_campaign runs/campaign_n8192 500 --np 8192 --bs 4 \
        --eval_every 50 --eval_size 32 --snapshot 100 \
        || echo "[finish_r4] stage 5 FAILED" >&2
fi

echo "[finish_r4] stage 6: N=8192 held-out eval" >&2
if [ ! -s runs/final_eval_n8192.json ]; then
    python - <<'PY' || echo "[finish_r4] stage 6 ref draw FAILED" >&2
import numpy as np, sys
sys.path.insert(0, ".")
from sp_gan_tpu.data.h5 import SyntheticDataset
ref = SyntheticDataset(n_items=48, n_points=8192, seed=1).data
np.save("runs/heldout_ref_8192.npy", ref)
PY
    timeout 5400 python evaluate.py --log_dir runs/campaign_n8192 \
        --ckpt runs/campaign_n8192/ckpt_epoch_500.pkl --ema --n 48 \
        --ref runs/heldout_ref_8192.npy --normalize \
        > runs/final_eval_n8192.json \
        || echo "[finish_r4] stage 6 FAILED" >&2
fi

echo "[finish_r4] stage 7: train synthetic-family FPD extractor" >&2
if [ ! -s runs/fpd_stats_synth.npz ]; then
    timeout 3600 python scripts/train_fpd_dgcnn.py \
        --out runs/fpd_dgcnn_synth.pkl --stats_out runs/fpd_stats_synth.npz \
        > runs/fpd_dgcnn_train.jsonl 2>/tmp/fpd_train.err \
        || echo "[finish_r4] stage 7 FAILED" >&2
fi

echo "[finish_r4] stage 8: FPD of the multi-class campaign endpoint" >&2
if [ -s runs/fpd_stats_synth.npz ] && [ ! -s runs/campaign_mc/final_fpd.json ]; then
    python - <<'PY' || echo "[finish_r4] stage 8 ref draw FAILED" >&2
import numpy as np, sys
sys.path.insert(0, ".")
from sp_gan_tpu.data import SyntheticMultiClassDataset
ref = SyntheticMultiClassDataset(n_items=96, n_points=2048, seed=2).data
np.save("runs/heldout_ref_mc.npy", ref)
PY
    timeout 3600 python evaluate.py --log_dir runs/campaign_mc \
        --ckpt runs/campaign_mc/ckpt_epoch_1500.pkl --ema --n 96 \
        --ref runs/heldout_ref_mc.npy --normalize --fpd \
        --fpd_weights runs/fpd_dgcnn_synth.pkl \
        --fpd_stats runs/fpd_stats_synth.npz \
        > runs/campaign_mc/final_fpd.json \
        || echo "[finish_r4] stage 8 FAILED" >&2
fi

echo "[finish_r4] done" >&2
