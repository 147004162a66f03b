"""Functional train state + optimizers.

Replaces the reference trainer's mutable module/optimizer attributes
(`Model.build_model`, `/root/reference/Generation/model.py:71-120`) with one
immutable pytree threaded through the jitted step. Adam betas (0.5, 0.99) and
the StepLR decay (step_size=lr_decay_feq epochs, gamma=lr_decay_rate) match
`model.py:94-110`.

Reference quirk preserved by omission: with --use_sgd the reference swaps G's
scheduler for CosineAnnealingLR(eta_min=lr_g) — annealing *to the initial lr*,
i.e. a no-op; we simply keep the constant schedule in that case.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn import Discriminator, Generator


class TrainState(struct.PyTreeNode):
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    g_ema: Any            # None unless cfg.ema
    step: jax.Array       # int32 scalar
    rng: jax.Array        # PRNG key


def make_lr_schedule(cfg: Config, base_lr: float, steps_per_epoch: int):
    """StepLR over epochs expressed as a step schedule."""
    if not cfg.lr_decay:
        return base_lr

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * (cfg.lr_decay_rate ** (epoch // cfg.lr_decay_feq))

    return schedule


def make_optimizers(cfg: Config, steps_per_epoch: int):
    g_tx = optax.adam(make_lr_schedule(cfg, cfg.lr_g, steps_per_epoch),
                      b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(make_lr_schedule(cfg, cfg.lr_d, steps_per_epoch),
                      b1=cfg.beta1, b2=cfg.beta2)
    return g_tx, d_tx


def create_train_state(
    cfg: Config,
    rng: jax.Array,
    steps_per_epoch: int = 1,
) -> Tuple[TrainState, Generator, Discriminator, optax.GradientTransformation,
           optax.GradientTransformation]:
    G, D = Generator(cfg), Discriminator(cfg)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    x = jnp.zeros((1, cfg.np, 3), jnp.float32)
    z = jnp.zeros((1, cfg.np, cfg.nz), jnp.float32)
    gv = G.init(k_g, x, z, train=True)
    dv = D.init(k_d, x, train=True)
    g_tx, d_tx = make_optimizers(cfg, steps_per_epoch)
    state = TrainState(
        g_params=gv["params"],
        g_stats=gv.get("batch_stats", {}),
        d_params=dv["params"],
        d_stats=dv.get("batch_stats", {}),
        g_opt=g_tx.init(gv["params"]),
        d_opt=d_tx.init(dv["params"]),
        g_ema=jax.tree.map(jnp.copy, gv["params"]) if cfg.ema else None,
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
    )
    return state, G, D, g_tx, d_tx


def param_count(tree) -> int:
    import numpy as np
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
