"""Checkpoint / resume.

Reference: `torch.save` dicts `{G_model, G_optimizer, G_epoch}` /
`{D_model, D_optimizer, D_epoch}` every `snapshot` epochs
(`/root/reference/Generation/model.py:505-528`), restored via `--restore`
(`model.py:189-195,461-503`; note the reference restores G's optimizer but
*not* D's — we restore both).

Here the whole `TrainState` pytree (params, batch stats, both optimizer
states, EMA, step, rng) is serialized in one shot via flax's state-dict
mechanism — a strict superset of the reference checkpoint contents — plus the
config for provenance (the reference's source-backup, model.py:59-68, becomes
a config dump).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from sp_gan_tpu.config import Config
from sp_gan_tpu.train.state import TrainState

CKPT_PREFIX = "ckpt_epoch_"


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    cfg: Optional[Config] = None,
                    filename: Optional[str] = None) -> str:
    """Snapshot the full TrainState. `filename` overrides the default
    `ckpt_epoch_{epoch}.pkl` name — used for the rolling `ckpt_best.pkl`
    (best in-loop EMA MMD-CD; the reference keeps only periodic epoch
    snapshots, model.py:505-528, so its best-mid-run weights are lost)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state_dict = serialization.to_state_dict(state)
    state_np = jax.tree.map(lambda x: np.asarray(x), state_dict)
    path = os.path.join(ckpt_dir, filename or f"{CKPT_PREFIX}{epoch}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"state": state_np, "epoch": epoch}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    if cfg is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith(CKPT_PREFIX) and f.endswith(".pkl")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(CKPT_PREFIX):-4]))
    return os.path.join(ckpt_dir, cands[-1])


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, int]:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    state = serialization.from_state_dict(template, blob["state"])
    return state, int(blob["epoch"])
