"""Latent-space shape manipulation API.

Rebuild of the reference's manipulation surface
(`/root/reference/Generation/model_test.py`, driven by `visual.py`). Every
routine there is a pure z-tensor edit over the fixed sphere-template point
ordering (SURVEY.md §3.3) — no model surgery — so here they are small pure
functions producing z tensors plus a `Manipulator` that batches them through
the jitted generator.

Reference routine -> API:
  simple_gen            (:139) -> Manipulator.generate
  draw_correspondense   (:207) -> Manipulator.correspondence
  draw_shape_intepolate (:279) -> Manipulator.shape_interpolate
  draw_part_shape_inte  (:342) -> Manipulator.part_interpolate
                                  (+ style-space variant: .style_interpolate,
                                  Generator.interpolate(use_latent=True))
  draw_part_shape_inte_detail (:456) -> Manipulator.part_interpolate_detail
  draw_part_edit        (:578) -> Manipulator.part_edit
  draw_part_flip        (:763) -> Manipulator.part_flip
  draw_part_exchange    (:859) -> Manipulator.part_exchange
  draw_edit_inte        (:665) -> Manipulator.edit_interpolate
Mask builders: half_space_mask, region_mask (the sphere-region growing the
reference does with its precomputed ball distance matrix, model.py:162-167).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sp_gan_tpu.config import Config
from sp_gan_tpu.data.augment import normalize_point_cloud
from sp_gan_tpu.data.sphere import sphere_sqdist, sphere_template


# ---------------------------------------------------------------- masks
def half_space_mask(ball: np.ndarray, axis: int = 0,
                    threshold: float = 0.0, positive: bool = True) -> np.ndarray:
    """{0,1}^N mask of template points on one side of an axis plane
    (draw_part_flip's half-space selection, model_test.py:797-835)."""
    side = ball[:, axis] > threshold
    return (side if positive else ~side).astype(np.int32)


def region_mask(ball: np.ndarray, anchor: int, num: int) -> np.ndarray:
    """{0,1}^N mask of the `num` template points nearest to point `anchor`
    (the region-growing used by n_mix and the part routines)."""
    d = sphere_sqdist(ball)[anchor]
    idx = np.argsort(d)[:num]
    mask = np.zeros(len(ball), np.int32)
    mask[idx] = 1
    return mask


# ---------------------------------------------------------------- z edits
def blend_z(z1: jax.Array, z2: jax.Array, mask, alpha: float) -> jax.Array:
    """z = z1 outside mask; (1-a) z1 + a z2 inside (model_test.py:427-445)."""
    m = jnp.asarray(mask).reshape(1, -1, 1).astype(z1.dtype)
    return z1 * (1 - m * alpha) + z2 * (m * alpha)


def replace_z(z1: jax.Array, z2: jax.Array, mask) -> jax.Array:
    """Splice: take z2 inside the mask (draw_part_edit, :633-650)."""
    m = jnp.asarray(mask).reshape(1, -1, 1).astype(bool)
    return jnp.where(m, z2, z1)


def flip_z(z: jax.Array, mask) -> jax.Array:
    """Negate the code inside the mask (draw_part_flip, :797-835)."""
    m = jnp.asarray(mask).reshape(1, -1, 1).astype(bool)
    return jnp.where(m, -z, z)


def exchange_z(za: jax.Array, zb: jax.Array, mask):
    """Swap codes between two shapes inside the mask (draw_part_exchange,
    :932-945). Returns (za', zb')."""
    m = jnp.asarray(mask).reshape(1, -1, 1).astype(bool)
    return jnp.where(m, zb, za), jnp.where(m, za, zb)


# ---------------------------------------------------------------- driver
class Manipulator:
    """Wraps a trained generator for the manipulation routines.

    Loads G only — mirrors `build_model_eval` (model_test.py:52-64); all
    forwards run in eval mode (BatchNorm running averages).
    """

    def __init__(self, cfg: Config, g_params, g_stats, sphere: Optional[np.ndarray] = None):
        from sp_gan_tpu.nn import Generator
        from sp_gan_tpu.nn.fused_eval import (
            generator_forward_eval, supports_fused)
        from sp_gan_tpu.ops.dispatch import pallas_enabled
        self.cfg = cfg
        self.ball = sphere if sphere is not None else sphere_template(cfg.np, cfg.template)
        self.sphere = jnp.asarray(self.ball)
        self.G = Generator(cfg)
        self.variables = {"params": g_params, "batch_stats": g_stats}
        if supports_fused(cfg) and pallas_enabled():
            self._fwd = jax.jit(
                lambda v, x, z: generator_forward_eval(cfg, v, x, z))
        else:
            # every routine forwards the broadcast template, so the first
            # EdgeBlock runs at B=1 (Generator.template_batch_const)
            b1 = cfg.edge1_b1 and not cfg.use_head and cfg.bn_groups == 1
            self._fwd = jax.jit(
                lambda v, x, z: self.G.apply(v, x, z, train=False,
                                             template_batch_const=b1))

    # -------------------------------------------------------------- core
    def forward(self, z: jax.Array) -> np.ndarray:
        B = z.shape[0]
        x = jnp.broadcast_to(self.sphere[None], (B,) + self.sphere.shape)
        return np.asarray(self._fwd(self.variables, x, z))

    def sample_codes(self, n: int, seed: int = 0,
                     per_point: Optional[bool] = None) -> jax.Array:
        """Latent codes [n, N, nz]. per_point=None follows cfg.n_rand, so a
        checkpoint trained with --n_rand (per-point iid codes,
        model.py:125-131) is sampled the way it was trained; the default
        (tiled global code) matches model_test.py's raw_noise tiling."""
        if per_point is None:
            per_point = self.cfg.n_rand
        key = jax.random.PRNGKey(seed)
        shape = (n, self.cfg.np if per_point else 1, self.cfg.nz)
        z = self.cfg.nv * jax.random.normal(key, shape)
        return jnp.broadcast_to(z, (n, self.cfg.np, self.cfg.nz))

    # -------------------------------------------------------------- API
    def generate(self, n: int, seed: int = 0, normalize: bool = True,
                 batch: int = 64, scan: Optional[bool] = None,
                 wire_dtype: Optional[str] = None) -> np.ndarray:
        """simple_gen: n shapes [n, N, 3] (normalized like model_test:139-203).

        scan=True folds the FULL batches into scanned lax.scan programs
        (power-of-two chunk lengths, so at most log2 dispatches) — bulk
        generation then pays a couple of host/relay round trips instead
        of one per batch (measured 7-14 ms each; BASELINE.md r4 serving
        notes). z is sampled in-scan from the same per-batch seeds, so
        the codes are bit-identical to the loop path; outputs agree up
        to float-reassociation noise (the scan body is a different XLA
        program, and a 1-ulp distance difference can flip a kNN neighbor
        on near-tie template distances — pass scan=False to bit-match
        per-batch-loop outputs).
        Default: auto — scan when n spans >= 4 batches. The remainder
        batch (and scan=False) use the plain per-batch dispatch loop.

        wire_dtype='bfloat16' casts the SCANNED bulk result to bf16 on
        device after normalization, halving the device->host transfer
        (the dominant fetch cost for bulk sizes; BASELINE.md r4 serving
        notes). The returned array is float32 with coordinates rounded
        through bf16 (|err| <= ~0.4% of the unit-sphere radius — the
        serving-precision probe measured this quality-free,
        runs/probe_serving_dtype.jsonl). Compute stays f32; only the
        wire format changes. The loop-path remainder (< 1 batch when
        scanning) is fetched in f32 either way."""
        if n <= 0:
            return np.zeros((0, self.cfg.np, 3), np.float32)
        if wire_dtype not in (None, "float32", "bfloat16"):
            raise ValueError(f"wire_dtype {wire_dtype!r} not in "
                             "(None, 'float32', 'bfloat16')")
        if scan is None:
            scan = n >= 4 * batch
        t = n // batch if scan else 0
        scanned, lo0 = None, 0
        if t > 1:
            scanned = self._generate_scanned(t, batch, seed, normalize,
                                             wire_dtype == "bfloat16")
            lo0 = t * batch
        outs = []
        for lo in range(lo0, n, batch):
            z = self.sample_codes(min(batch, n - lo), seed + lo)
            outs.append(self.forward(z))
        rest = None
        if outs:
            # one normalize dispatch for the whole loop-path remainder
            # (per-cloud op, so slice-wise == concatenated); the scanned
            # part already normalized in-scan on device
            rest = np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            if normalize:
                rest = np.asarray(normalize_point_cloud(rest))
        if rest is None:
            return scanned
        if scanned is None:
            return rest
        return np.concatenate([scanned, rest], axis=0)

    def _generate_scanned(self, t: int, batch: int, seed: int,
                          normalize: bool, wire_bf16: bool = False
                          ) -> np.ndarray:
        """t full batches through scanned programs. The scan length is a
        structural shape (every distinct length would be its own XLA
        compile), so t is decomposed into power-of-two chunks: a bounded
        set of compiled programs serves ALL bulk sizes, at <= log2(t)
        dispatches per call. Per-batch codes come from sample_codes'
        PRNGKey(seed + i*batch) arithmetic, identical to the loop path.
        Normalization runs in-scan on device — it is per-cloud and nearly
        free there, while a host pass over the bulk result costs ~0.5 s
        per 1k clouds at N=2048 (BASELINE.md r4 serving notes)."""
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        cache_key = (batch, normalize, wire_bf16)
        if cache_key not in self._scan_cache:
            x = jnp.broadcast_to(self.sphere[None],
                                 (batch,) + self.sphere.shape)
            fwd, sample = self._fwd, self.sample_codes

            def scanned(variables, seeds):
                def body(c, s):
                    pcs = fwd(variables, x, sample(batch, s))
                    if normalize:
                        pcs = normalize_point_cloud(pcs)
                    # compute + normalization stay f32; cast only the
                    # carried-out value so the host fetch moves half the
                    # bytes (wire format, not a compute precision change)
                    return c, pcs.astype(jnp.bfloat16) if wire_bf16 else pcs
                return jax.lax.scan(body, 0, seeds)[1]

            self._scan_cache[cache_key] = jax.jit(scanned)
        prog = self._scan_cache[cache_key]
        # dispatch every pow2 chunk before forcing any fetch: jax dispatch
        # is async, so chunk k+1 computes on device while chunk k's result
        # streams to the host (the fetch dominates bulk wall time —
        # BASELINE.md r4 serving notes)
        pending, lengths, i0 = [], [], 0
        while i0 < t:
            length = 1 << ((t - i0).bit_length() - 1)  # max pow2 <= rest
            seeds = seed + batch * (i0 + jnp.arange(length, dtype=jnp.int32))
            pending.append(prog(self.variables, seeds))
            lengths.append(length)
            i0 += length
        outs = [np.asarray(dev).astype(np.float32, copy=False)
                .reshape(length * batch, self.cfg.np, 3)
                for dev, length in zip(pending, lengths)]
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    def correspondence(self, n: int = 4, seed: int = 0):
        """Shapes + per-point colors from sphere xyz (draw_correspondense:
        color = template coords mapped to [0,1]^3)."""
        pcs = self.generate(n, seed)
        colors = (self.ball - self.ball.min(0)) / np.ptp(self.ball, 0)
        return pcs, np.broadcast_to(colors[None], pcs.shape).copy()

    def shape_interpolate(self, seed_a: int = 0, seed_b: int = 1,
                          steps: int = 6) -> np.ndarray:
        """Global z interpolation between two shapes (:279-341). [steps,N,3]."""
        za = self.sample_codes(1, seed_a)
        zb = self.sample_codes(1, seed_b)
        alphas = np.linspace(0.0, 1.0, steps)
        zs = jnp.concatenate([za * (1 - a) + zb * a for a in alphas], axis=0)
        return self.forward(zs)

    def part_interpolate(self, mask, seed_a: int = 0, seed_b: int = 1,
                         steps: int = 6) -> np.ndarray:
        """Interpolate z only inside `mask` (:342-455)."""
        za = self.sample_codes(1, seed_a)
        zb = self.sample_codes(1, seed_b)
        zs = jnp.concatenate(
            [blend_z(za, zb, mask, a) for a in np.linspace(0, 1, steps)], axis=0)
        return self.forward(zs)

    def style_interpolate(self, mask, seed_a: int = 0, seed_b: int = 1,
                          steps: int = 6) -> np.ndarray:
        """Latent (style-space) part interpolation: blend the *post-head
        styles* of two codes inside `mask` (`Generator.interpolate(
        use_latent=True)`, Generator.py:216-232). [steps, N, 3]."""
        za = self.sample_codes(1, seed_a)
        zb = self.sample_codes(1, seed_b)
        x = self.sphere[None]
        sel = jnp.asarray(mask)
        fwd = jax.jit(lambda v, a: self.G.apply(
            v, x, za, train=False, z2=zb, blend_mask=sel, blend_alpha=a))
        return np.concatenate(
            [np.asarray(fwd(self.variables, a))
             for a in np.linspace(0.0, 1.0, steps)], axis=0)

    def part_interpolate_detail(self, seed_a: int = 0, seed_b: int = 1,
                                alphas: Sequence[float] = (1.0, 0.75, 0.5,
                                                           0.25, 0.0),
                                mask_sizes: Sequence[int] = (0, 512, 1024,
                                                             1536, 2048),
                                normalize: bool = True):
        """Multi-region fine-grained part interpolation
        (draw_part_shape_inte_detail, model_test.py:456-577): a 2-D sweep of
        blend weight x region size. Region j = the last `mask_sizes[j]`
        template points; inside it z = alpha*z_a + (1-alpha)*z_b (alpha
        weights code A, as the reference does).

        Returns (shape_row [len(alphas),N,3], grid
        [len(alphas),len(mask_sizes),N,3], region_masks
        [len(mask_sizes),N])."""
        N = self.cfg.np
        za = self.sample_codes(1, seed_a)
        zb = self.sample_codes(1, seed_b)
        masks = np.zeros((len(mask_sizes), N), np.int32)
        for j, m in enumerate(mask_sizes):
            if m > 0:
                masks[j, N - m:] = 1

        # row 1: plain shape interpolation over alphas (model_test.py:523-539)
        zs = jnp.concatenate([a * za + (1 - a) * zb for a in alphas], axis=0)
        shape_row = self.forward(zs)

        rows = []
        for a in alphas:
            zrow = jnp.concatenate(
                [jnp.where(jnp.asarray(masks[j]).reshape(1, -1, 1) > 0,
                           a * za + (1 - a) * zb, za)
                 for j in range(len(mask_sizes))], axis=0)
            rows.append(self.forward(zrow))
        grid = np.stack(rows, axis=0)
        if normalize:
            # reference scales 0.75 * normalize_point_cloud (:539,:563)
            shape_row = 0.75 * np.asarray(normalize_point_cloud(shape_row))
            grid = 0.75 * np.asarray(normalize_point_cloud(
                grid.reshape(-1, N, 3))).reshape(grid.shape)
        return shape_row, grid, masks

    def part_edit(self, mask, seed: int = 0, n_variants: int = 4) -> np.ndarray:
        """Keep the shape, resample the masked part (:578-663).
        Returns [1+n_variants, N, 3] (original first)."""
        z = self.sample_codes(1, seed)
        zs = [z]
        for i in range(n_variants):
            z2 = self.sample_codes(1, seed + 101 + i)
            zs.append(replace_z(z, z2, mask))
        return self.forward(jnp.concatenate(zs, axis=0))

    def part_flip(self, axis: int = 0, seed: int = 0, n: int = 4) -> np.ndarray:
        """Negate z on a half-space for n shapes (:763-857).
        Returns [2n, N, 3]: (orig, flipped) pairs."""
        mask = half_space_mask(self.ball, axis=axis)
        z = self.sample_codes(n, seed)
        return self.forward(jnp.concatenate([z, flip_z(z, mask)], axis=0))

    def part_exchange(self, mask, seed_a: int = 0, seed_b: int = 1) -> np.ndarray:
        """Swap a region's codes between two shapes (:859-976).
        Returns [4, N, 3]: a, b, a-with-b-part, b-with-a-part."""
        za = self.sample_codes(1, seed_a)
        zb = self.sample_codes(1, seed_b)
        zab, zba = exchange_z(za, zb, mask)
        return self.forward(jnp.concatenate([za, zb, zab, zba], axis=0))

    def edit_interpolate(self, mask, seed: int = 0, seed_edit: int = 7,
                         steps: int = 6) -> np.ndarray:
        """Part edit + interpolation toward the edit (:665-761)."""
        z = self.sample_codes(1, seed)
        z2 = self.sample_codes(1, seed_edit)
        zs = jnp.concatenate(
            [blend_z(z, z2, mask, a) for a in np.linspace(0, 1, steps)], axis=0)
        return self.forward(zs)


def from_checkpoint(ckpt_path: str, cfg: Config,
                    use_ema: bool = False) -> Manipulator:
    """Build a Manipulator from a training checkpoint (G-only load, like the
    reference eval-side `load`, model_test.py:978-1009). `use_ema` swaps in
    the EMA generator weights recorded by `--ema` training (the reference
    has EMA helpers, `Common/network_utils.py:97-118`, but never serves from
    them; the in-loop eval curves show which of the two is ahead)."""
    from sp_gan_tpu.train.checkpoint import load_checkpoint
    from sp_gan_tpu.train.state import create_train_state
    template, *_ = create_train_state(cfg, jax.random.PRNGKey(0))
    state, _ = load_checkpoint(ckpt_path, template)
    params = state.g_params
    if use_ema:
        if state.g_ema is None:
            raise ValueError(f"{ckpt_path} holds no EMA weights "
                             "(trained without --ema)")
        params = state.g_ema
    return Manipulator(cfg, params, state.g_stats)
