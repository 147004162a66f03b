"""Layer library — the live subset of `/root/reference/Generation/modules.py`
rebuilt channel-last for TPU.

Initialization parity notes (these shape GAN training dynamics, SURVEY.md §7
"hard parts" #4):
  * `TorchDense` replicates torch's Conv1d/Linear default init:
    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    weight and bias.
  * `EqualDense` replicates the reference's equalized-LR wrapper
    (`modules.py:259-288`): stored weight ~ N(0,1), bias 0, effective weight
    scaled by sqrt(2/fan_in) at every forward.
  * `AdaptivePointNorm.style` starts as identity: weight ~ N(0,1) but bias
    [gamma=1, beta=0] (`Generator.py:32-36`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sp_gan_tpu.ops import edge_features  # noqa: F401  (public re-export)
from sp_gan_tpu.ops.edge import edge_diff_features


def torch_uniform_init(scale_from_fan_in: bool = True):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv/Linear default."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else int(jnp.prod(jnp.array(shape[:-1])))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch default init (== 1x1 Conv1d on [B, N, C])."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (fan_in, self.features),
        )
        y = jnp.matmul(x.astype(self.dtype or x.dtype), kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y


class EqualDense(nn.Module):
    """Equalized-learning-rate dense (reference `EqualConv1d`/`EqualLinear` +
    `EqualLR`, `modules.py:202-288`): weight stored ~N(0,1), rescaled by
    sqrt(2/fan_in) in the forward pass so the effective LR is uniform."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.normal(1.0), (fan_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = math.sqrt(2.0 / fan_in)
        return jnp.matmul(x, (kernel * scale).astype(x.dtype)) + bias.astype(x.dtype)


def make_dense(eql: bool) -> Callable[..., nn.Module]:
    return EqualDense if eql else TorchDense


class SplitEdgeDense(nn.Module):
    """The EdgeBlock value conv (`conv_x`) computed without materializing the
    [B, N, k, 2C] concat: with kernel K [2C, F],
    `concat([central, diff]) @ K == central @ K[:C] + diff @ K[C:]` — and the
    central term only depends on the point, so it is a [B, N, C] x [C, F]
    matmul broadcast over k instead of k redundant copies. Parameter shapes,
    names and init are identical to `TorchDense(F, name="conv_x")` on the
    concatenated input, so checkpoints and the torch converter are
    unaffected."""

    features: int

    @nn.compact
    def __call__(self, central, diff):
        C = central.shape[-1]
        bound = 1.0 / math.sqrt(2 * C)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (2 * C, self.features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        kc = kernel.astype(diff.dtype)
        v = jnp.matmul(diff, kc[C:]) \
            + jnp.matmul(central, kc[:C])[:, :, None, :]
        return v + bias.astype(v.dtype)


def instance_norm_points(x: jax.Array, eps: float = 1e-5,
                         axis_name: Optional[str] = None) -> jax.Array:
    """InstanceNorm1d (no affine) on [B, N, C]: normalize each channel over
    the point axis per sample — matches torch `nn.InstanceNorm1d` on [B, C, N]
    (biased variance, eps inside the sqrt). Statistics accumulate in f32 even
    under bf16 compute.

    axis_name: when the point axis is sharded (inside shard_map), the moments
    are combined across shards with a pmean — exact global statistics."""
    xf = x.astype(jnp.float32)
    if axis_name is not None:
        mean = jax.lax.pmean(jnp.mean(xf, axis=1, keepdims=True), axis_name)
        sq = jax.lax.pmean(jnp.mean(xf * xf, axis=1, keepdims=True),
                           axis_name)
        var = sq - mean * mean
    else:
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.var(xf, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * inv).astype(x.dtype)


class SPBatchNorm(nn.Module):
    """BatchNorm with f32 statistics under any compute dtype.

    Drop-in for flax `nn.BatchNorm` on channel-last inputs (same param /
    batch_stats naming: scale, bias / mean, var), normalizing over all axes
    but the last. Statistics and the running averages stay float32 so bf16
    activations don't destroy the moments of the big [B, N, k, C] edge
    tensors; the scale/shift applies in the input dtype. Matches torch
    BatchNorm{1,2}d train/eval numerics (biased batch variance, eps in sqrt).

    Sharding semantics: with `groups == 1` (default) statistics are taken
    over the FULL batch. Under GSPMD data parallelism a jnp.mean over the
    sharded batch axis is a *global* mean (XLA inserts the cross-shard
    reduction) — i.e. synchronized BN. `groups = n_shards` instead splits
    the leading batch axis into contiguous groups and normalizes each group
    by its own statistics — exactly the per-replica stats of the reference's
    `nn.DataParallel` training (`Generation/model.py:79-84`), expressed as
    pure array math so GSPMD keeps the group reductions shard-local when the
    batch sharding is aligned. Running averages then track group 0, matching
    torch DataParallel's keep-replica-0-buffers behavior.

    Under the explicit shard_map step the same two scopes are expressed with
    collectives instead: `axis_names` pmeans the moments across shards
    (global/sync-BN), while `replica0_axes` names axes that statistics do
    NOT pool over — each shard normalizes by its own batch stats (the
    per-replica DataParallel semantics) and the running averages track
    index 0 along those axes (torch keeps the master replica's buffers), so
    the nominally-replicated state stays bitwise identical on every device.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 1
    axis_names: Sequence[str] = ()   # shard_map axes to pmean statistics
                                     # over (the point-sharded train step);
                                     # incompatible with groups > 1
    replica0_axes: Sequence[str] = ()  # shard_map axes excluded from stat
                                       # pooling; running averages take
                                       # index-0's value along them
                                       # (cfg.bn_stats="per_shard" under the
                                       # point-sharded step)

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        # param/stat shapes don't depend on grouping; init may use a dummy
        # batch smaller than the group count
        G = 1 if self.is_initializing() else self.groups
        assert not (self.axis_names and G > 1), \
            "per-shard BN groups are not supported under explicit shard_map"
        assert not set(self.replica0_axes) & set(self.axis_names), \
            "an axis cannot be both pooled and per-replica"
        if train:
            xf = x.astype(jnp.float32)
            if G > 1:
                B = x.shape[0]
                assert B % G == 0, f"batch {B} not divisible by {G} groups"
                xg = xf.reshape((G, B // G) + x.shape[1:])
                axes = tuple(range(1, xg.ndim - 1))
                mean = jnp.mean(xg, axis=axes)                   # [G, C]
                var = jnp.mean(xg * xg, axis=axes) - mean * mean
                batch_mean, batch_var = mean[0], var[0]          # replica 0
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=axes)
                sq = jnp.mean(xf * xf, axis=axes)
                if self.axis_names and not self.is_initializing():
                    # exact global moments across shards (equal shard sizes)
                    mean = jax.lax.pmean(mean, self.axis_names)
                    sq = jax.lax.pmean(sq, self.axis_names)
                var = sq - mean * mean
                batch_mean, batch_var = mean, var
            if not self.is_initializing():
                rm, rv = batch_mean, batch_var
                for ax in self.replica0_axes:
                    # running averages track index 0 along per-replica axes
                    # (torch DataParallel keeps the master replica's
                    # buffers); the broadcast keeps the replicated state
                    # identical on every shard
                    sel = (jax.lax.axis_index(ax) == 0).astype(jnp.float32)
                    rm = jax.lax.psum(rm * sel, ax)
                    rv = jax.lax.psum(rv * sel, ax)
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1 - self.momentum) * rm
                ra_var.value = self.momentum * ra_var.value \
                    + (1 - self.momentum) * rv
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        if train and G > 1:
            shape = (G, 1) + (1,) * (x.ndim - 2) + (C,)
            y = (xf.reshape((G, x.shape[0] // G) + x.shape[1:])
                 - mean.reshape(shape)) * inv.reshape(shape) \
                + bias
            y = y.reshape(x.shape)
        else:
            y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


def bn_collective_axes(cfg):
    """(axis_names, replica0_axes) for SPBatchNorm under the explicit
    shard_map train step (cfg.data_axis / cfg.points_axis set).

    bn_stats="global": moments pmean over every mesh axis — sync-BN.
    bn_stats="per_shard": moments pool over the points axis only, so each
    data replica normalizes by its own batch statistics (the reference
    DataParallel's per-replica semantics, `Generation/model.py:79-84`) and
    running averages track data-replica 0 (torch keeps the master replica's
    buffers)."""
    axes = tuple(a for a in (cfg.data_axis, cfg.points_axis) if a)
    if cfg.bn_stats == "per_shard" and cfg.data_axis is not None:
        return (tuple(a for a in (cfg.points_axis,) if a),
                (cfg.data_axis,))
    return axes, ()


class MaxPoolBNLReLU(nn.Module):
    """Fused `max_pool(lrelu(batchnorm(h)))` via pool/norm commutation
    (ROADMAP r2 #2 / VERDICT r2 #6): BN is a per-channel affine and leaky
    ReLU is monotone increasing, so

        max_n lrelu(bn(h))  ==  lrelu(bn(max_n h))   where scale >= 0
                            ==  lrelu(bn(min_n h))   where scale <  0.

    The [B, N, C] tensor is then touched only by four reductions (max, min,
    mean, mean-of-squares) instead of the full BN-normalize + lrelu
    elementwise chains and their backwards — on the discriminator's
    [24, 2048, 1024] fc2 activation that removes ~200 MB-sized passes in
    both directions. Parameter / batch-stat names match `SPBatchNorm`
    (scale, bias / mean, var), so checkpoints and the torch converter are
    unaffected; numerics equivalence-tested in tests/test_models.py.

    Only valid for global (groups == 1, un-shard_mapped) statistics."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, h, train: bool = True):
        C = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        hf = h.astype(jnp.float32)
        if train:
            axes = tuple(range(h.ndim - 1))
            mean = jnp.mean(hf, axis=axes)
            var = jnp.mean(hf * hf, axis=axes) - mean * mean
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value \
                    + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        pooled = jnp.where(scale >= 0, jnp.max(hf, axis=1),
                           jnp.min(hf, axis=1))          # [B, C]
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (pooled - mean) * inv + bias
        return nn.leaky_relu(y, self.negative_slope)


class AdaptivePointNorm(nn.Module):
    """Per-point AdaIN (`Generator.py:24-45`): instance-norm the features,
    then scale/shift with (gamma, beta) predicted per point from the style."""

    channels: int
    use_eql: bool = False
    points_axis: Optional[str] = None   # sharded point axis (shard_map)

    @nn.compact
    def __call__(self, x, style):
        C = self.channels
        fan_in = style.shape[-1]

        def bias_init(key, shape):
            # identity at init: gamma=1, beta=0 (Generator.py:35-36)
            return jnp.concatenate([jnp.ones((C,)), jnp.zeros((C,))])

        kernel = self.param("style_kernel", nn.initializers.normal(1.0), (fan_in, 2 * C))
        bias = self.param("style_bias", bias_init, (2 * C,))
        k = kernel * math.sqrt(2.0 / fan_in) if self.use_eql else kernel
        gb = jnp.matmul(style, k.astype(style.dtype)) + bias.astype(style.dtype)
        gamma, beta = gb[..., :C], gb[..., C:]
        axis = None if self.is_initializing() else self.points_axis
        return gamma * instance_norm_points(x, axis_name=axis) + beta


class EdgeBlock(nn.Module):
    """Attention-weighted EdgeConv (`Generator.py:47-88`), [B,N,Fin] -> [B,N,Fout].

    Edge features [B,N,k,2Fin] -> two branches:
      conv_w on the (nbr-central) half -> per-neighbor softmax weights,
      conv_x on the full edge feature -> values,
    elementwise product, then a (k*Fout -> Fout) contraction collapsing the
    neighbor axis (the reference's Conv2d with [1, k] kernel).
    """

    fin: int
    fout: int
    k: int
    norm_momentum: float = 0.9
    negative_slope: float = 0.01
    mixed: bool = False   # bf16 internals (f32 norms/params), f32 in/out
    bn_groups: int = 1    # per-shard BN stat groups (see SPBatchNorm)
    points_axis: Optional[str] = None   # sharded point axis: kNN/edge runs
                                        # shard-local vs all-gathered keys
                                        # (parallel.points.edge_diff_local)
    bn_axes: Sequence[str] = ()         # shard_map axes for BN statistics
    bn_replica0_axes: Sequence[str] = ()  # shard_map axes with per-replica
                                          # BN stats (see SPBatchNorm)

    @nn.compact
    def __call__(self, x, train: bool = True, idx=None, ee=None,
                 window=None):
        """`idx` [B,N,k] optionally supplies precomputed kNN indices, and
        `ee` [B,N,k,2C] a fully precomputed edge tensor — used for the
        generator's first EdgeConv, whose input is the *static* sphere
        template: its kNN graph AND its gathered edge features are
        run-constants (the reference recomputes both every forward,
        modules.py:694-703; XLA's runtime gather of them cost 4 ms/step
        before hoisting). `window` (with idx/ee None) restricts neighbor
        selection to the circular index band |i - j| <= window — the
        `--knn_mode approx` banded kernel (ops/approx_knn.py)."""
        B, N, C = x.shape
        assert C == self.fin
        out_dtype = x.dtype
        # only the diff half (nbr - central) is ever materialized at
        # [B, N, k, C]: conv_w consumes it directly and conv_x folds the
        # broadcast central half into a per-point matmul (SplitEdgeDense),
        # halving the step's dominant HBM tensor vs the reference's
        # [central, nbr-central] concat (modules.py:683-725)
        if self.points_axis is not None and not self.is_initializing() \
                and ee is None:
            from sp_gan_tpu.parallel.points import edge_diff_local
            diff = edge_diff_local(x, self.k, self.points_axis)
            if self.mixed:
                diff = diff.astype(jnp.bfloat16)
        elif ee is not None:
            diff = ee[..., C:]
            if self.mixed:
                diff = diff.astype(jnp.bfloat16)
        elif self.mixed:
            # kNN selection stays f32 (inside the fused kNN+gather sweep or
            # the dispatch); only the big [B,N,k,*] edge tensors and their
            # convs run bf16
            if idx is None:
                diff = edge_diff_features(x, self.k, out_dtype=jnp.bfloat16,
                                          window=window)
            else:
                diff = edge_diff_features(x.astype(jnp.bfloat16), self.k,
                                          idx=idx)
        else:
            diff = edge_diff_features(x, self.k, idx=idx,
                                      window=window)        # [B, N, k, C]
        # named residual: the policy-remat path saves only this tensor and
        # recomputes the conv/BN/softmax chains in the backward (avoids both
        # re-running the kNN+gather and storing the chain intermediates)
        from jax.ad_checkpoint import checkpoint_name
        diff = checkpoint_name(diff, "edge_feats")
        central = x.astype(diff.dtype)                       # [B, N, C]

        lrelu = lambda v: nn.leaky_relu(v, self.negative_slope)
        bn = lambda name, v: SPBatchNorm(
            momentum=self.norm_momentum, groups=self.bn_groups,
            axis_names=tuple(self.bn_axes),
            replica0_axes=tuple(self.bn_replica0_axes),
            name=name)(v, train=train)

        # attention branch (conv_w)
        w = TorchDense(self.fout // 2, name="conv_w1")(diff)
        w = lrelu(bn("bn_w1", w))
        w = TorchDense(self.fout, name="conv_w2")(w)
        w = lrelu(bn("bn_w2", w))
        w = jax.nn.softmax(w, axis=2)                        # softmax over k

        # value branch (conv_x) — same (2C -> fout) kernel as the reference,
        # applied as central@W[:C] (per point, broadcast over k) +
        # diff@W[C:] (per edge)
        v = SplitEdgeDense(self.fout, name="conv_x")(central, diff)
        v = lrelu(bn("bn_x", v))
        v = v * w

        # conv_out: Conv2d [1,k] kernel == contraction over (k, Fout)
        fan_in = self.k * self.fout
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "out_kernel",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
            (self.k, self.fout, self.fout),
        )
        out_bias = self.param(
            "out_bias",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
            (self.fout,),
        )
        out = jnp.einsum("bnkc,kco->bno", v, kernel.astype(v.dtype))
        out = out + out_bias.astype(out.dtype)
        return out.astype(out_dtype) if self.mixed else out


class Attention(nn.Module):
    """Global self-attention (`modules.py:534-558`, BigGAN-style): 1/8-dim
    query/key, 1/2-dim value, zero-init learnable gain, residual.

    points_axis: under the point-sharded train step the [N, N] energy
    matrix is the memory reason for sharding in the first place — queries
    stay local, keys/values are all-gathered once, each shard holds only
    its [n_local, N] rows (the row softmax is exact: it's over the full
    gathered key axis)."""

    channels: int
    points_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        theta = TorchDense(ch // 8, use_bias=False, name="theta")(x)   # [B,N,c8]
        phi = TorchDense(ch // 8, use_bias=False, name="phi")(x)
        g = TorchDense(ch // 2, use_bias=False, name="g")(x)           # [B,N,c2]
        if self.points_axis is not None and not self.is_initializing():
            phi = jax.lax.all_gather(phi, self.points_axis, axis=1,
                                     tiled=True)              # [B, N, c8]
            g = jax.lax.all_gather(g, self.points_axis, axis=1,
                                   tiled=True)                # [B, N, c2]
        energy = jnp.einsum("bnc,bmc->bnm", theta, phi)
        beta = jax.nn.softmax(energy, axis=-1)
        o = jnp.einsum("bnm,bmc->bnc", beta, g)
        o = TorchDense(ch, use_bias=False, name="o")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * o + x
