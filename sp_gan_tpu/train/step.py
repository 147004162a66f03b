"""The fused, jitted G+D training step.

Reference loop (`/root/reference/Generation/model.py:239-279`) per batch:
  D-step: fresh z, fake = G(x,z).detach(); D(real), D(fake) as *separate*
          forwards (separate BatchNorm batch statistics — preserved here);
          dis_loss; Adam step on D.
  G-step: fresh z; G(x,z); D(fake) against the *updated* D; gen_loss;
          Adam step on G.

Here both phases are one XLA program: a single `jit` with donated state, so
weight updates happen in-place in HBM and the host only sees scalar metrics.
The `requires_grad` freezing dance (model.py:240-241,264-265) is replaced by
taking `jax.grad` w.r.t. exactly the right parameter subtree.

Data parallelism: call via jit with the batch sharded over the mesh's `data`
axis and the state replicated — XLA GSPMD inserts the gradient all-reduces
(the TPU equivalent of DataParallel, SURVEY.md §2.4). Because GSPMD keeps
full-array semantics, BatchNorm's batch statistics are *global* across
shards by default — i.e. the synchronized-BN behavior the reference's
vendored-but-unwired sync_bn was for (SURVEY.md §2.4 row 2), obtained for
free. The reference's live DataParallel computed per-replica stats instead;
`cfg.bn_stats="per_shard"` reproduces that exactly (SPBatchNorm groups —
see nn/layers.py; distinguished numerically in tests/test_bn_semantics.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sp_gan_tpu.config import Config
from sp_gan_tpu.data.noise import sample_z
from sp_gan_tpu.losses import dis_loss, gen_loss, wgan_gp
from sp_gan_tpu.train.state import TrainState


def make_train_step(
    cfg: Config,
    G,
    D,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    sphere: jax.Array,
    ball_sqdist: Optional[jax.Array] = None,
    mesh=None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Returns jitted `step(state, real_batch) -> (state, metrics)`.

    `sphere` [N,3] is closed over as a compile-time constant (it is static for
    the whole run, reference model.py:231). real_batch: [B, N, 3].
    """
    use_gp = cfg.gan == "wgan" and cfg.lambda_gp > 0

    # The sphere template is static for the whole run, so EdgeConv1's kNN
    # graph AND its gathered edge tensor are run-constants — computed once
    # here, not once per forward (the reference recomputes both every G
    # call, modules.py:694-703; XLA's runtime gather of the constant cost
    # 4 ms/step before this hoist).
    from sp_gan_tpu.ops.edge import edge_features
    from sp_gan_tpu.ops.pairwise import knn_indices
    template_idx = jax.device_get(
        knn_indices(sphere[None].astype(jnp.float32), cfg.nk // 2))[0]
    template_idx = jnp.asarray(template_idx)                  # [N, k]
    template_ee = jnp.asarray(jax.device_get(edge_features(
        sphere[None].astype(jnp.float32), cfg.nk // 2,
        idx=template_idx[None]))[0])                          # [N, k, 6]

    from sp_gan_tpu.nn.fused_eval import supports_fused
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    fused_ok = supports_fused(cfg) and pallas_enabled()
    use_fused_g = cfg.fused_train and fused_ok
    # The D-phase generator forward runs under stop_gradient, so the fused
    # train-mode forward (whose backward kernels are the slow part) can serve
    # it regardless of the fused_train flag.
    use_fused_dphase = cfg.fused_dphase and fused_ok

    # edge1's input is the batch-constant template: run it at B=1 and
    # broadcast (see Generator.template_batch_const)
    edge1_b1 = cfg.edge1_b1 and not cfg.use_head and cfg.bn_groups == 1

    def g_forward(g_params, g_stats, x, z, grad_needed=True):
        B = x.shape[0]
        fused = use_fused_g or (use_fused_dphase and not grad_needed)
        if fused:
            from sp_gan_tpu.nn.fused_train import generator_forward_train
            idx = jnp.broadcast_to(template_idx[None],
                                   (B,) + template_idx.shape)
            ee1 = jnp.broadcast_to(template_ee[None],
                                   (B,) + template_ee.shape)
            out, new_stats = generator_forward_train(
                cfg, g_params, g_stats, x, z, edge1_idx=idx, edge1_ee=ee1)
            return out, {"batch_stats": new_stats}
        if edge1_b1:
            idx, ee1 = template_idx[None], template_ee[None]
        else:
            idx = jnp.broadcast_to(template_idx[None],
                                   (B,) + template_idx.shape)
            ee1 = jnp.broadcast_to(template_ee[None],
                                   (B,) + template_ee.shape)
        return G.apply({"params": g_params, "batch_stats": g_stats},
                       x, z, train=True, edge1_idx=idx, edge1_ee=ee1,
                       template_batch_const=edge1_b1,
                       mutable=["batch_stats"])

    def d_forward(d_params, d_stats, pts):
        return D.apply({"params": d_params, "batch_stats": d_stats},
                       pts, train=True, mutable=["batch_stats"])

    def step(state: TrainState, real: jax.Array):
        B = real.shape[0]
        x = jnp.broadcast_to(sphere[None], (B,) + sphere.shape)
        rng, k_zd, k_zg, k_nd, k_ng, k_gp = jax.random.split(state.rng, 6)

        # ---------------- D step ----------------
        z_d = sample_z(k_zd, B, cfg.np, cfg.nz, cfg.nv, cfg.n_rand,
                       cfg.n_mix, ball_sqdist, sphere=sphere)
        fake, g_mut = g_forward(state.g_params, state.g_stats, x, z_d,
                                grad_needed=False)
        fake = jax.lax.stop_gradient(fake)
        g_stats = g_mut["batch_stats"]

        def d_loss_fn(d_params):
            logit_real, mut1 = d_forward(d_params, state.d_stats, real)
            logit_fake, mut2 = d_forward(d_params, mut1["batch_stats"], fake)
            loss, info = dis_loss(logit_real, logit_fake, gan=cfg.gan,
                                  noise_label=cfg.flip_d, rng=k_nd)
            d_stats_out = mut2["batch_stats"]
            if use_gp:
                d_only = lambda pts: d_forward(d_params, state.d_stats, pts)[0]
                loss = loss + wgan_gp(d_only, real, fake, k_gp, cfg.lambda_gp,
                                      emd_pairing=cfg.gp_mapping,
                                      emd_iters=cfg.gp_emd_iters)
            if cfg.mix:
                # CutMix regularization (reference --mix intent): EMD-aligned
                # real/fake splices labeled fake.
                from sp_gan_tpu.losses import cutmix, mix_loss
                mixed, _, _ = cutmix(k_gp, real, fake,
                                     emd_iters=cfg.mix_emd_iters)
                logit_mix, mut3 = d_forward(d_params, d_stats_out, mixed)
                m_loss, _ = mix_loss(logit_mix, gan=cfg.gan)
                loss = loss + m_loss
                d_stats_out = mut3["batch_stats"]
            return loss, (d_stats_out, info)

        def guarded_update(tx, grads, opt_state, params):
            """Optionally skip the whole update when any grad is non-finite
            (cfg.nan_guard): params/opt state pass through unchanged."""
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if not cfg.nan_guard:
                return new_params, new_opt
            finite = jnp.all(jnp.stack([
                jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
            ]))
            pick = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(finite, a, b), new, old)
            return pick(new_params, params), pick(new_opt, opt_state)

        (d_loss_val, (d_stats, d_info)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_params, d_opt = guarded_update(d_tx, d_grads, state.d_opt,
                                         state.d_params)

        # ---------------- G step (against updated D) ----------------
        z_g = sample_z(k_zg, B, cfg.np, cfg.nz, cfg.nv, cfg.n_rand,
                       cfg.n_mix, ball_sqdist, sphere=sphere)

        def g_loss_fn(g_params):
            fake2, mutg = g_forward(g_params, g_stats, x, z_g)
            logit_fake, mutd = d_forward(d_params, d_stats, fake2)
            if cfg.gan == "real":
                logit_real, mutd = d_forward(d_params, mutd["batch_stats"], real)
            else:
                logit_real = None
            loss, _ = gen_loss(logit_real, logit_fake, gan=cfg.gan,
                               noise_label=cfg.flip_g, rng=k_ng)
            return loss, (mutg["batch_stats"], mutd["batch_stats"])

        (g_loss_val, (g_stats, d_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_params, g_opt = guarded_update(g_tx, g_grads, state.g_opt,
                                         state.g_params)

        g_ema = state.g_ema
        if g_ema is not None:
            decay = cfg.ema_rate
            g_ema = jax.tree.map(
                lambda e, p: decay * e + (1.0 - decay) * p, g_ema, g_params)

        new_state = state.replace(
            g_params=g_params, g_stats=g_stats, d_params=d_params,
            d_stats=d_stats, g_opt=g_opt, d_opt=d_opt, g_ema=g_ema,
            step=state.step + 1, rng=rng)
        metrics = {
            "d_loss": d_loss_val,
            "g_loss": g_loss_val,
            "real_acc": d_info["real_acc"],
            "fake_acc": d_info["fake_acc"],
        }
        return new_state, metrics

    donate = (0,) if cfg.donate_state else ()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data", None, None))
        return jax.jit(step, donate_argnums=donate,
                       in_shardings=(rep, data),
                       out_shardings=(rep, rep))
    return jax.jit(step, donate_argnums=donate)


def make_train_step_pointsharded(
    cfg: Config,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    sphere: jax.Array,
    mesh,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Point-sharded train step on a 2-D (data x points) mesh — the TPU-native
    scale story for N >= 16384 clouds (the point-cloud analog of sequence
    parallelism; the reference has no equivalent — SURVEY.md §2.4 names it as
    the optional SP extension, BASELINE.json configs[4]).

    The WHOLE step runs inside one `shard_map`: batch sharded over `data`,
    points sharded over `points`, parameters/optimizer state replicated.
    Cross-shard communication is explicit and rides ICI:
      * EdgeBlock kNN: all_gather of the [B, N, C] features once per block;
        the O(N^2/P) distance tiles and [B, N/P, k, C] edge tensors stay
        shard-local (parallel.points.edge_diff_local);
      * instance-norm / BatchNorm moments: pmean over (data, points);
      * global max pools: all_gather of per-shard maxima (differentiable —
        gradients route to the owning shard);
      * gradients: parameter cotangents are pmean'd over both axes, which
        with the manual-mode collective transposes yields exactly the
        unsharded gradients (see the in-body comment; equivalence-tested in
        tests/test_points_sharding.py).

    --attn works sharded (queries local, keys/values all-gathered — see
    nn.layers.Attention) and --n_mix works sharded (anchor distance rows
    computed from the sphere on the fly; no [N, N] matrix). --mix and
    --gp_mapping work sharded too: both route their EMD through
    `parallel.points.emd_auction_local` (shard-local [N/P, N] distance
    tiles, replicated prices), CutMix ranks on all-gathered anchor-distance
    scalars, and the GP's gradient norm psums its squares over `points`
    (see losses/gp.py, losses/cutmix.py).
    --bn_stats per_shard works sharded: BN moments pool over `points` only,
    so each data replica normalizes by its own batch statistics (the
    reference DataParallel semantics with n_data replicas) and running
    averages broadcast from data-replica 0 (torch keeps the master
    replica's buffers) — see nn.layers.bn_collective_axes; equivalence-
    tested vs the grouped GSPMD math in tests/test_points_sharding.py.
    Unsupported in this step (asserted off): fused pallas EdgeBlocks.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sp_gan_tpu.nn import Discriminator, Generator

    assert tuple(mesh.axis_names) == ("data", "points"), mesh.axis_names
    n_data, n_points_shards = mesh.devices.shape
    assert cfg.np % n_points_shards == 0
    scfg = cfg.replace(data_axis="data", points_axis="points",
                       fused_train=False, fused_dphase=False)
    G, D = Generator(scfg), Discriminator(scfg)
    use_gp = cfg.gan == "wgan" and cfg.lambda_gp > 0
    axes = ("data", "points")

    # template edge tensor for EdgeConv1, computed once globally; each shard
    # slices its local rows inside the shard_map
    from sp_gan_tpu.ops.edge import edge_features
    from sp_gan_tpu.ops.pairwise import knn_indices
    template_idx = jax.device_get(
        knn_indices(sphere[None].astype(jnp.float32), cfg.nk // 2))[0]
    template_ee = jnp.asarray(jax.device_get(edge_features(
        sphere[None].astype(jnp.float32), cfg.nk // 2,
        idx=jnp.asarray(template_idx)[None]))[0])             # [N, k, 6]
    edge1_b1 = cfg.edge1_b1 and not cfg.use_head

    def g_forward(g_params, g_stats, x, z, ee_local):
        return G.apply({"params": g_params, "batch_stats": g_stats},
                       x, z, train=True, edge1_ee=ee_local,
                       template_batch_const=edge1_b1,
                       mutable=["batch_stats"])

    def d_forward(d_params, d_stats, pts):
        return D.apply({"params": d_params, "batch_stats": d_stats},
                       pts, train=True, mutable=["batch_stats"])

    def local_z(key, B_local):
        """The exact global z draw of the unsharded step, sliced to this
        shard's (batch rows, point rows) — bit-identical latents regardless
        of the mesh, so the sharded step reproduces the unsharded one (the
        equivalence test depends on this). Tiled codes broadcast from
        [B, 1, nz], so the global-shaped draw is cheap."""
        z = sample_z(key, B_local * n_data, cfg.np, cfg.nz, cfg.nv,
                     cfg.n_rand, cfg.n_mix, sphere=sphere)
        n_local = cfg.np // n_points_shards
        dd = jax.lax.axis_index("data")
        p = jax.lax.axis_index("points")
        z = jax.lax.dynamic_slice_in_dim(z, dd * B_local, B_local, 0)
        return jax.lax.dynamic_slice_in_dim(z, p * n_local, n_local, 1)

    def local_step(state: TrainState, real_local: jax.Array):
        B_local, n_local, _ = real_local.shape
        p = jax.lax.axis_index("points")
        x_shard = jax.lax.dynamic_slice_in_dim(
            sphere, p * n_local, n_local, 0)                  # [n_local, 3]
        x = jnp.broadcast_to(x_shard[None], (B_local, n_local, 3))
        ee_local = jax.lax.dynamic_slice_in_dim(
            template_ee, p * n_local, n_local, 0)[None]       # [1,n_local,k,6]
        rng, k_zd, k_zg, k_nd, k_ng, k_gp = jax.random.split(state.rng, 6)
        # k_gp stays UNfolded: wgan_gp/cutmix draw global-batch-shaped
        # randomness from it and slice this shard's rows (like local_z), so
        # the sharded step reproduces the unsharded draws bit-identically
        k_nd = jax.random.fold_in(k_nd, jax.lax.axis_index("data"))
        k_ng = jax.random.fold_in(k_ng, jax.lax.axis_index("data"))

        # ---------------- D step ----------------
        z_d = local_z(k_zd, B_local)
        fake, g_mut = g_forward(state.g_params, state.g_stats, x, z_d,
                                ee_local)
        fake = jax.lax.stop_gradient(fake)
        g_stats = g_mut["batch_stats"]

        def d_loss_fn(d_params):
            logit_real, mut1 = d_forward(d_params, state.d_stats, real_local)
            logit_fake, mut2 = d_forward(d_params, mut1["batch_stats"], fake)
            loss, info = dis_loss(logit_real, logit_fake, gan=cfg.gan,
                                  noise_label=cfg.flip_d, rng=k_nd)
            if use_gp:
                d_only = lambda pts: d_forward(d_params, state.d_stats,
                                               pts)[0]
                loss = loss + wgan_gp(d_only, real_local, fake, k_gp,
                                      cfg.lambda_gp,
                                      emd_pairing=cfg.gp_mapping,
                                      emd_iters=cfg.gp_emd_iters,
                                      points_axis="points",
                                      data_axis="data")
            d_stats_out = mut2["batch_stats"]
            if cfg.mix:
                from sp_gan_tpu.losses import cutmix, mix_loss
                mixed, _, _ = cutmix(k_gp, real_local, fake,
                                     emd_iters=cfg.mix_emd_iters,
                                     points_axis="points",
                                     data_axis="data")
                logit_mix, mut3 = d_forward(d_params, d_stats_out, mixed)
                m_loss, _ = mix_loss(logit_mix, gan=cfg.gan)
                loss = loss + m_loss
                d_stats_out = mut3["batch_stats"]
            return jax.lax.pmean(loss, axes), (d_stats_out, info)

        # Under manual-mode shard_map (check_vma=False) psum transposes to
        # psum, so the backward — seeded 1 on every shard — differentiates
        # the SUM of all shard losses: the psum'd parameter cotangents come
        # out exactly (n_data * n_points_shards) x the global-mean gradient.
        # pmean restores it (equivalence-tested vs the unsharded step).
        (d_loss_val, (d_stats, d_info)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_grads = jax.lax.pmean(d_grads, axes)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G step ----------------
        z_g = local_z(k_zg, B_local)

        def g_loss_fn(g_params):
            fake2, mutg = g_forward(g_params, g_stats, x, z_g, ee_local)
            logit_fake, mutd = d_forward(d_params, d_stats, fake2)
            if cfg.gan == "real":
                logit_real, mutd = d_forward(d_params, mutd["batch_stats"],
                                             real_local)
            else:
                logit_real = None
            loss, _ = gen_loss(logit_real, logit_fake, gan=cfg.gan,
                               noise_label=cfg.flip_g, rng=k_ng)
            return jax.lax.pmean(loss, axes), (mutg["batch_stats"],
                                               mutd["batch_stats"])

        (g_loss_val, (g_stats_new, d_stats_new)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_grads = jax.lax.pmean(g_grads, axes)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = state.g_ema
        if g_ema is not None:
            decay = cfg.ema_rate
            g_ema = jax.tree.map(
                lambda e, q: decay * e + (1.0 - decay) * q, g_ema, g_params)

        new_state = state.replace(
            g_params=g_params, g_stats=g_stats_new, d_params=d_params,
            d_stats=d_stats_new, g_opt=g_opt, d_opt=d_opt, g_ema=g_ema,
            step=state.step + 1, rng=rng)
        metrics = {
            "d_loss": d_loss_val,
            "g_loss": g_loss_val,
            "real_acc": jax.lax.pmean(d_info["real_acc"], "data"),
            "fake_acc": jax.lax.pmean(d_info["fake_acc"], "data"),
        }
        return new_state, metrics

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("data", "points", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    donate = (0,) if cfg.donate_state else ()
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", "points", None))
    return jax.jit(sharded, donate_argnums=donate,
                   in_shardings=(rep, data), out_shardings=(rep, rep))


def make_sample_fn_pointsharded(cfg: Config, sphere: jax.Array, mesh,
                                use_ema: bool = False):
    """Eval-mode sampler over the 2-D (data x points) mesh — serving for
    clouds too large for one chip's quadratic ops (companion to
    `make_train_step_pointsharded`; eval mode uses BN running stats, so no
    cross-shard statistics are needed — only the edge all_gathers, the
    global-max gather and instance-norm pmeans).

    Returns jitted `(state, z [B, N, nz]) -> [B, N, 3]`."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sp_gan_tpu.nn import Generator

    assert tuple(mesh.axis_names) == ("data", "points"), mesh.axis_names
    n_points_shards = mesh.devices.shape[1]
    assert cfg.np % n_points_shards == 0
    scfg = cfg.replace(data_axis="data", points_axis="points",
                       fused_eval=False)
    G = Generator(scfg)
    edge1_b1 = cfg.edge1_b1 and not cfg.use_head

    from sp_gan_tpu.ops.edge import edge_features
    from sp_gan_tpu.ops.pairwise import knn_indices
    template_idx = jax.device_get(
        knn_indices(sphere[None].astype(jnp.float32), cfg.nk // 2))[0]
    template_ee = jnp.asarray(jax.device_get(edge_features(
        sphere[None].astype(jnp.float32), cfg.nk // 2,
        idx=jnp.asarray(template_idx)[None]))[0])             # [N, k, 6]

    def local_sample(state: TrainState, z_local: jax.Array):
        B_local, n_local, _ = z_local.shape
        p = jax.lax.axis_index("points")
        x_shard = jax.lax.dynamic_slice_in_dim(
            sphere, p * n_local, n_local, 0)
        x = jnp.broadcast_to(x_shard[None], (B_local, n_local, 3))
        ee_local = jax.lax.dynamic_slice_in_dim(
            template_ee, p * n_local, n_local, 0)[None]
        params = state.g_ema if (use_ema and state.g_ema is not None) \
            else state.g_params
        return G.apply({"params": params, "batch_stats": state.g_stats},
                       x, z_local, train=False, edge1_ee=ee_local,
                       template_batch_const=edge1_b1)

    sharded = shard_map(
        local_sample, mesh=mesh,
        in_specs=(P(), P("data", "points", None)),
        out_specs=P("data", "points", None),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data", "points", None))
    return jax.jit(sharded, in_shardings=(rep, dp), out_shardings=dp)


def make_sample_fn(cfg: Config, G, sphere: jax.Array, use_ema: bool = False):
    """Jitted sampler: (state, z [B,N,nz]) -> clouds [B,N,3] (eval mode —
    BatchNorm running averages, the reference's `draw_sample` path)."""

    from sp_gan_tpu.nn.fused_eval import generator_forward_eval, supports_fused
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    from sp_gan_tpu.ops.pairwise import knn_indices
    template_idx = jax.device_get(
        knn_indices(sphere[None].astype(jnp.float32), cfg.nk // 2))[0]
    template_idx = jnp.asarray(template_idx)
    use_fused = cfg.fused_eval and supports_fused(cfg) and pallas_enabled()
    edge1_b1 = cfg.edge1_b1 and not cfg.use_head and cfg.bn_groups == 1

    @jax.jit
    def sample(state: TrainState, z: jax.Array):
        B = z.shape[0]
        x = jnp.broadcast_to(sphere[None], (B,) + sphere.shape)
        params = state.g_ema if (use_ema and state.g_ema is not None) \
            else state.g_params
        variables = {"params": params, "batch_stats": state.g_stats}
        if use_fused:
            idx = jnp.broadcast_to(template_idx[None],
                                   (B,) + template_idx.shape)
            return generator_forward_eval(cfg, variables, x, z, edge1_idx=idx)
        idx = template_idx[None] if edge1_b1 else jnp.broadcast_to(
            template_idx[None], (B,) + template_idx.shape)
        return G.apply(variables, x, z, train=False, edge1_idx=idx,
                       template_batch_const=edge1_b1)

    return sample
