#!/bin/bash
# End-of-round measurements + held-out quality table for the r3b rerun
# (stage 4 of scripts/finish_r3b.sh). Runs with the TPU free.
set -u
cd "$(dirname "$0")/.."

# 1. held-out reference draw: same synthetic family, DISJOINT seed from the
#    training set (campaign trains on SyntheticDataset seed=0; eval.jsonl's
#    in-loop reference is a training-data draw — this is the final
#    gen-vs-test protocol instead)
python - <<'PY' || { echo "[final_eval] FATAL: held-out ref generation failed" >&2; exit 1; }
import numpy as np, sys
sys.path.insert(0, ".")
from sp_gan_tpu.data.h5 import SyntheticDataset
ref = SyntheticDataset(n_items=200, n_points=2048, seed=1).data
np.save("runs/heldout_ref.npy", ref)
print("held-out ref:", ref.shape)
PY

# 2. checkpoints to score: the curve's best-EMA-MMD snapshot + the final
#    checkpoint of the extended campaign and of each LR-intervention tail
CKPTS=$(python - <<'PY'
import json, os
best, best_v = None, 1e9
with open("runs/campaign_r3b/eval.jsonl") as f:
    for line in f:
        try:
            r = json.loads(line)
        except ValueError:
            continue  # partially-written trailing line from a watchdog kill
        v = r.get("ema", {}).get("MMD-CD")
        ep = r.get("epoch")
        ck = f"runs/campaign_r3b/ckpt_epoch_{ep}.pkl"
        if v is not None and v < best_v and os.path.exists(ck):
            best, best_v = ck, v
out = [p for p in (best,
                   "runs/campaign_r3b/ckpt_epoch_3300.pkl",
                   "runs/tail_lrboth/ckpt_epoch_3300.pkl",
                   "runs/tail_lrd/ckpt_epoch_3300.pkl")
       if p and os.path.exists(p)]
print("\n".join(dict.fromkeys(out)))
PY
) || { echo "[final_eval] FATAL: checkpoint selection failed" >&2; exit 1; }
if [ -z "$CKPTS" ]; then
    echo "[final_eval] FATAL: no checkpoints found to evaluate" >&2
    exit 1
fi

mkdir -p runs/final_eval_r3
for ck in $CKPTS; do
    tag=$(basename "$(dirname "$ck")")_$(basename "$ck" .pkl)
    echo "[final_eval] $ck -> $tag" >&2
    # n=96: the audited metric-protocol regime of BASELINE.md (96x96
    # matrices) — keeps the 3-matrix EMD under ~15 min/checkpoint
    timeout 5400 python evaluate.py --log_dir runs/campaign_r3b \
        --ckpt "$ck" --ema --n 96 --ref runs/heldout_ref.npy \
        --normalize --emd > "runs/final_eval_r3/$tag.json" \
        || echo "[final_eval] FAILED $ck" >&2
done

# 3. end-of-round perf sweep + bench
timeout 3600 python scripts/round3_final_measurements.py \
    > runs/round3_final_measurements.jsonl 2>/tmp/r3_meas.err \
    || echo "[final_eval] measurements failed" >&2
timeout 1200 python bench.py > runs/bench_r3_final.json 2>/tmp/r3_bench.err \
    || echo "[final_eval] bench failed" >&2
echo "[final_eval] done" >&2
