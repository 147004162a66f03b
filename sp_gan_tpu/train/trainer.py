"""Experiment driver — rebuild of the reference trainer
(`/root/reference/Generation/model.py:182-334`): epoch loop, alternating G/D
updates (fused into one jitted step), meters, `log_train.txt` + `args.txt`
logging, periodic checkpoints, optional sample dumps.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sp_gan_tpu.config import Config
from sp_gan_tpu.data import (
    H5Dataset,
    SyntheticDataset,
    augment_batch,
    prefetch_to_device,
    sphere_template,
)
from sp_gan_tpu.data.noise import sample_z
from sp_gan_tpu.parallel import batch_sharding, make_mesh
from sp_gan_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from sp_gan_tpu.train.state import create_train_state, param_count
from sp_gan_tpu.train.step import make_sample_fn, make_train_step
from sp_gan_tpu.utils import AverageValueMeter, enable_compile_cache


class Trainer:
    def __init__(self, cfg: Config, dataset=None):
        self.cfg = cfg
        # hang watchdog (see utils/watchdog.py): covers ALL of __init__ —
        # including enable_compile_cache(), whose jax.default_backend()
        # call is the first backend init and can block forever inside the
        # runtime's connect-retry loop when the device relay is down
        # (observed: a restarted campaign hung there with no watchdog
        # armed, wedging the supervisor). Install the watchdog before the
        # first statement that can touch the device; train() beats it
        # after every dispatch.
        self._dog = None
        if cfg.watchdog_secs > 0:
            from sp_gan_tpu.utils.watchdog import Watchdog

            def _on_timeout(stale):
                # self.log may not exist yet during __init__
                print(f"[watchdog] no progress for {stale:.0f}s; "
                      "exiting 42 for supervised restart", flush=True)
                os._exit(42)
            self._dog = Watchdog(cfg.watchdog_secs, _on_timeout).start()
        enable_compile_cache()
        os.makedirs(cfg.log_dir, exist_ok=True)
        self._log_fout = open(
            os.path.join(cfg.log_dir, "log_train.txt"),
            "a" if cfg.restore else "w")
        with open(os.path.join(cfg.log_dir, "args.txt"), "w") as f:
            f.write(cfg.to_json())
        # source snapshot for experiment provenance (reference backs up its
        # source files into each log dir, model.py:59-68). First writer
        # wins: a restore must not overwrite the snapshot of the code the
        # run was actually started with.
        snap = os.path.join(cfg.log_dir, "src_snapshot")
        if not os.path.isdir(snap):
            import shutil
            pkg_root = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            shutil.copytree(
                pkg_root, os.path.join(snap, "sp_gan_tpu"),
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc",
                                              "*.so", "native_build"))

        # data
        if dataset is not None:
            self.dataset = dataset
        else:
            try:
                self.dataset = H5Dataset(cfg.data_root, cfg.choice, cfg.np,
                                         cfg.scale, cls=cfg.cls, con=cfg.con)
            except (FileNotFoundError, OSError) as e:
                self.log(f"H5 data unavailable ({e}); using synthetic data")
                # big enough that an epoch is more than one batch at any bs
                self.dataset = SyntheticDataset(
                    n_items=max(240, cfg.bs * 8), n_points=cfg.np)
        self.steps_per_epoch = cfg.steps_per_epoch or max(
            1, len(self.dataset) // cfg.bs)

        # sphere template (static input x, reference model.py:231). n_mix's
        # anchor-distance rows are computed from the sphere inside the step
        # (no [N, N] precompute — the reference's ball_dist matrix,
        # model.py:162-167, is 1 GB at N=16384)
        ball = sphere_template(cfg.np, cfg.template)
        self.sphere = jnp.asarray(ball)

        # mesh (data-parallel)
        n_mesh = int(np.prod(cfg.mesh_shape))
        self.mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes) if n_mesh > 1 else None

        # state + step
        rng = jax.random.PRNGKey(cfg.seed)
        self.state, self.G, self.D, g_tx, d_tx = create_train_state(
            cfg, rng, self.steps_per_epoch)
        self.log(f"# generator parameters: {param_count(self.state.g_params)}")
        self.log(f"# discriminator parameters: {param_count(self.state.d_params)}")
        if self.mesh is not None and "points" in self.mesh.axis_names \
                and self.mesh.shape["points"] > 1:
            # 2-D (data x points) mesh: the point-sharded shard_map step
            # (N >= 16384 training — see make_train_step_pointsharded)
            from sp_gan_tpu.train.step import make_train_step_pointsharded
            self.train_step = make_train_step_pointsharded(
                cfg, g_tx, d_tx, self.sphere, self.mesh)
        else:
            self.train_step = make_train_step(cfg, self.G, self.D, g_tx, d_tx,
                                              self.sphere, mesh=self.mesh)
        self.sample_fn = make_sample_fn(cfg, self.G, self.sphere,
                                        use_ema=cfg.ema)
        self.sample_raw = (make_sample_fn(cfg, self.G, self.sphere,
                                          use_ema=False)
                           if cfg.ema else self.sample_fn)
        self.start_epoch = 1
        if cfg.restore:
            if cfg.pretrain_model_G:
                # reference model.py:189-195: --restore with explicit
                # checkpoint names warm-starts from those files
                epoch = self._warm_start(cfg.pretrain_model_G,
                                         cfg.pretrain_model_D)
                self.start_epoch = epoch + 1
            else:
                path = latest_checkpoint(cfg.log_dir)
                if path:
                    self.state, epoch = load_checkpoint(path, self.state)
                    self.start_epoch = epoch + 1
                    self.log(f"[*] restored {path} (epoch {epoch})")

        # fixed z for periodic sample grids (model.py:232)
        self.fix_z = sample_z(jax.random.PRNGKey(cfg.seed + 1), 64, cfg.np,
                              cfg.nz, cfg.nv, cfg.n_rand)

        # best-checkpoint tracking (ckpt_best.pkl at the lowest in-loop EMA
        # MMD-CD): the in-loop curves routinely peak mid-run (e.g. r3b EMA
        # MMD-CD 0.00931 @112k vs 0.00962 at the endpoint), and the
        # reference's periodic-snapshot-only scheme loses those weights.
        # best.json persists the incumbent across watchdog restarts.
        self._best = {"value": float("inf")}
        best_path = os.path.join(cfg.log_dir, "best.json")
        if cfg.restore and os.path.exists(best_path):
            import json
            with open(best_path) as f:
                self._best = json.load(f)
            self.log(f"[*] best-so-far {self._best.get('metric', 'MMD-CD')}="
                     f"{self._best['value']:.5f} "
                     f"(epoch {self._best.get('epoch')})")

        self._augment = jax.jit(
            lambda key, pc: augment_batch(key, pc, True)) if cfg.augment else None

    # ------------------------------------------------------------------
    def log(self, msg: str):
        self._log_fout.write(msg + "\n")
        self._log_fout.flush()
        print(msg, flush=True)

    # ------------------------------------------------------------------
    def _warm_start(self, g_path: str, d_path: Optional[str] = None) -> int:
        """`--restore --pretrain_model_G <f>` (reference model.py:189-195):
        warm-start from named checkpoint files instead of the newest
        snapshot. `.pth` files are reference torch checkpoints run through
        the compat converter (fresh optimizer state, like the reference's
        D-side restore); `.pkl` files are this framework's own checkpoints
        (full state incl. both optimizers)."""
        cfg = self.cfg

        def resolve(p):
            # reference joins log_dir with the flag value (model.py:470)
            if p and not os.path.exists(p) and \
                    os.path.exists(os.path.join(cfg.log_dir, p)):
                return os.path.join(cfg.log_dir, p)
            return p

        g_path, d_path = resolve(g_path), resolve(d_path)
        if g_path.endswith(".pth"):
            from sp_gan_tpu.compat import load_reference_checkpoint
            (g_params, g_stats), d, epoch = load_reference_checkpoint(
                g_path, cfg, d_path)
            state = self.state.replace(g_params=g_params, g_stats=g_stats)
            if d is not None:
                state = state.replace(d_params=d[0], d_stats=d[1])
            if state.g_ema is not None:
                state = state.replace(
                    g_ema=jax.tree.map(jnp.asarray, g_params))
            self.state = state
            self.log(f"[*] warm-start from reference checkpoint {g_path}"
                     + (f" + {d_path}" if d_path else "")
                     + f" (epoch {epoch})")
            return epoch
        self.state, epoch = load_checkpoint(g_path, self.state)
        self.log(f"[*] restored {g_path} (epoch {epoch})")
        return epoch

    # ------------------------------------------------------------------
    def evaluate(self, epoch: int, global_step: int) -> dict:
        """In-loop quality evaluation: MMD-CD / COV-CD / 1NN-CD / JSD of
        `eval_size` generated clouds against a fixed reference draw from the
        TRAINING data (the standard gen-vs-train monitoring protocol; for
        final numbers use evaluate.py against a disjoint test set), for raw
        and (when enabled) EMA generator weights. Results go to the log and
        `log_dir/eval.jsonl`.

        The reference's only in-training quality monitor is periodic sample
        plots (`/root/reference/Generation/model.py:304-307,371-410`); this
        runs the quantitative protocol (`Common/loss_utils.py:430-463`)
        on-device at snapshot cadence instead. Clouds are unit-sphere
        normalized before CD (the probe methodology of BASELINE.md, so
        numbers are comparable across rounds); JSD uses the 0.5-scaled
        clouds the reference protocol expects inside the voxel cube."""
        import json

        from sp_gan_tpu.data.augment import normalize_point_cloud
        from sp_gan_tpu.eval.metrics import (
            coverage,
            jsd,
            knn_two_sample,
            mmd,
            pairwise_cd_matrix,
            pairwise_emd_matrix,
        )

        cfg = self.cfg
        n = min(cfg.eval_size, len(self.dataset))
        if not hasattr(self, "_eval_ref"):
            ref_rng = np.random.default_rng(cfg.seed + 999)
            idx = np.sort(ref_rng.choice(len(self.dataset), n, replace=False))
            ref = np.asarray(self.dataset.data[idx], np.float32)
            self._eval_ref = np.asarray(normalize_point_cloud(ref))
            self._eval_tt = np.asarray(pairwise_cd_matrix(
                jnp.asarray(self._eval_ref), jnp.asarray(self._eval_ref)))
            self._eval_tt_emd = None
        ref = self._eval_ref

        # jsd_scale: same in-cube convention as eval/metrics.py's
        # compute_all_metrics default — the two JSD columns this repo
        # emits (in-loop eval.jsonl, final-protocol evaluate.py) are
        # comparable by construction (tests/test_eval_metrics.py).
        record = {"epoch": epoch, "step": global_step, "jsd_scale": 0.5}
        variants = [("ema", self.sample_fn), ("raw", self.sample_raw)] \
            if cfg.ema else [("raw", self.sample_fn)]
        for name, fn in variants:
            outs = []
            key = jax.random.PRNGKey(cfg.seed + 777)
            for lo in range(0, n, 32):
                key, kz = jax.random.split(key)
                z = sample_z(kz, min(32, n - lo), cfg.np, cfg.nz, cfg.nv,
                             cfg.n_rand)
                outs.append(np.asarray(fn(self.state, z)))
            gen = np.asarray(normalize_point_cloud(
                np.concatenate(outs)[:n]))
            gj, rj = jnp.asarray(gen), jnp.asarray(ref)
            gg = np.asarray(pairwise_cd_matrix(gj, gj))
            gt = np.asarray(pairwise_cd_matrix(gj, rj))
            m = {"MMD-CD": mmd(gt), "COV-CD": coverage(gt),
                 "1NN-CD": knn_two_sample(gg, gt, self._eval_tt),
                 "JSD": jsd(0.5 * gen, 0.5 * ref, warn=False)}
            if cfg.fpd_weights:
                # never let a numerically-degenerate sqrtm (few-sample
                # high-dim covariances can go complex) kill a multi-hour
                # campaign: the FPD column is monitoring, not control flow
                try:
                    m["FPD"] = self._inloop_fpd(gen)
                except Exception as e:  # noqa: BLE001
                    self.log(f"[eval] in-loop FPD failed: {e!r}")
                    m["FPD"] = float("nan")
            if cfg.eval_emd:
                # train-regime auction (eps=0.005/50, early-terminating):
                # a monitoring-grade EMD at interactive cost; report final
                # numbers with evaluate.py's full test-regime protocol
                if self._eval_tt_emd is None:
                    self._eval_tt_emd = pairwise_emd_matrix(rj, rj)
                gg_e = pairwise_emd_matrix(gj, gj)
                gt_e = pairwise_emd_matrix(gj, rj)
                m.update({"MMD-EMD": mmd(gt_e), "COV-EMD": coverage(gt_e),
                          "1NN-EMD": knn_two_sample(gg_e, gt_e,
                                                    self._eval_tt_emd)})
            record[name] = m
            self.log("EVAL epoch=%d step=%d [%s] " % (epoch, global_step, name)
                     + " ".join(f"{k}={v:.5f}" for k, v in m.items()))
        with open(os.path.join(cfg.log_dir, "eval.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

        # rolling best checkpoint on the EMA (falling back to raw) MMD-CD
        if cfg.track_best:
            variant = "ema" if cfg.ema else "raw"
            v = float(record[variant]["MMD-CD"])
            if v < self._best.get("value", float("inf")):
                self._best = {"metric": "MMD-CD", "variant": variant,
                              "value": v, "epoch": epoch,
                              "step": global_step}
                save_checkpoint(cfg.log_dir, self.state, epoch, cfg,
                                filename="ckpt_best.pkl")
                tmp = os.path.join(cfg.log_dir, "best.json.tmp")
                with open(tmp, "w") as f:
                    json.dump(self._best, f)
                os.replace(tmp, os.path.join(cfg.log_dir, "best.json"))
                self.log(f"[best] new best {variant} MMD-CD={v:.5f} "
                         f"-> ckpt_best.pkl (epoch {epoch})")
        return record

    # ------------------------------------------------------------------
    def _inloop_fpd(self, gen_normalized: np.ndarray) -> float:
        """FPD column for the in-loop eval: activations of the already-
        normalized generated clouds through the trained DGCNN extractor
        (`cfg.fpd_weights`), against `cfg.fpd_stats` when given or the
        eval reference draw otherwise. One ~N-sample activation pass —
        cheap next to the CD matrices. Synthetic-family extractors give
        synthetic-family-only numbers (see docs/MODEL_ZOO.md); the
        reference computes FPD only at final eval
        (Common/GAN_metrics.py:537)."""
        if not hasattr(self, "_fpd"):
            import pickle

            from sp_gan_tpu.eval.fpd import FPD
            with open(self.cfg.fpd_weights, "rb") as f:
                blob = pickle.load(f)
            # extractor hyperparams travel with the pickle (k/feat_dims
            # written by scripts/train_fpd_dgcnn.py; default-k fallback
            # for pre-meta pickles)
            self._fpd = FPD(variables={k: blob[k]
                                       for k in ("params", "batch_stats")
                                       if k in blob},
                            k=int(blob.get("k", 40)),
                            feat_dims=int(blob.get("feat_dims", 1024)))
            self._fpd_ref_stats = None
            if not self.cfg.fpd_stats:
                from sp_gan_tpu.eval.fpd import activation_statistics
                self._fpd_ref_stats = activation_statistics(
                    self._fpd.activations(self._eval_ref))
        from sp_gan_tpu.eval.fpd import (
            activation_statistics,
            frechet_distance,
        )
        mu1, s1 = activation_statistics(self._fpd.activations(gen_normalized))
        if self._fpd_ref_stats is None:
            blob = np.load(self.cfg.fpd_stats)
            self._fpd_ref_stats = (blob["mu"], blob["sigma"])
        mu2, s2 = self._fpd_ref_stats
        return frechet_distance(mu1, s1, mu2, s2)

    # ------------------------------------------------------------------
    def _batch_sharding(self):
        """Input sharding for real batches: batch over `data`, plus the
        point axis over `points` when the 2-D point-sharded mesh is up."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if "points" in self.mesh.axis_names \
                and self.mesh.shape["points"] > 1:
            return NamedSharding(self.mesh, P("data", "points", None))
        return batch_sharding(self.mesh)

    # ------------------------------------------------------------------
    def _device_data_step(self):
        """On-device input path: the whole dataset lives in HBM; a single
        dispatch drives a `lax.scan` chunk of cfg.steps_per_call steps, each
        receiving only a [bs] index row — batch gather, per-item point
        shuffle and augmentation all happen inside the jitted program.

        This removes both the per-step host->device batch staging (the
        reference streams every batch through DataLoader workers + pinned
        copies) and the per-step dispatch latency: through this
        environment's device relay each dispatch costs ~ms, which was most
        of the r1 trainer-vs-bare-step gap. Returns a callable
        (state, idxs [T, bs], key) -> (state, last-step metrics).
        """
        from sp_gan_tpu.data.augment import shuffle_points_batch

        cfg = self.cfg
        data_dev = jax.device_put(jnp.asarray(self.dataset.data))
        base = self.train_step

        def chunk_from_idx(state, idxs, key):
            keys = jax.random.split(key, idxs.shape[0] * 2).reshape(
                idxs.shape[0], 2, 2)

            def body(st, xs):
                idx, ks = xs
                real = jnp.take(data_dev, idx, axis=0)
                real = shuffle_points_batch(ks[0], real)
                if cfg.augment:
                    real = augment_batch(ks[1], real, True)
                if self.mesh is not None:
                    real = jax.lax.with_sharding_constraint(
                        real, self._batch_sharding())
                return base(st, real)

            state, ms = jax.lax.scan(body, state, (idxs, keys))
            return state, jax.tree.map(lambda a: a[-1], ms)

        donate = (0,) if cfg.donate_state else ()
        return jax.jit(chunk_from_idx, donate_argnums=donate)

    def train(self, max_epoch: Optional[int] = None):
        cfg = self.cfg
        max_epoch = max_epoch or cfg.max_epoch
        rng_np = np.random.default_rng(cfg.seed)
        aug_key = jax.random.PRNGKey(cfg.seed + 2)
        sharding = self._batch_sharding() if self.mesh else None

        # on-device data path when the dataset fits in HBM (<=1GB)
        use_device_data = self.dataset.data.nbytes <= (1 << 30)
        if use_device_data:
            # build the jitted chunk ONCE per Trainer: a fresh closure per
            # train() call would miss jax.jit's cache and recompile
            if not hasattr(self, "_chunk_step"):
                self._chunk_step = self._device_data_step()
            step_from_idx = self._chunk_step
            data_key = jax.random.PRNGKey(cfg.seed + 3)

        from sp_gan_tpu.utils.profiling import StepTimer

        dog = self._dog
        if dog:
            dog.beat()

        d_meter, g_meter = AverageValueMeter(), AverageValueMeter()
        ra_meter, fa_meter = AverageValueMeter(), AverageValueMeter()
        timer = StepTimer(points_per_step=cfg.bs * cfg.np, window=50)
        t_start = time.time()
        # resume from the restored optimizer step so eval.jsonl / sample
        # dumps carry a monotonically increasing global step across restarts
        global_step = int(jax.device_get(self.state.step))

        for epoch in range(self.start_epoch, max_epoch + 1):
            # per-epoch meter averages (reference model.py resets each epoch;
            # without this the short-epoch fallback below only ever fires in
            # the first epoch and later summaries reprint stale numbers)
            for meter in (d_meter, g_meter, ra_meter, fa_meter):
                meter.reset()
            metrics = None
            if use_device_data:
                order = rng_np.permutation(len(self.dataset))
                n_steps = len(order) // cfg.bs
                if self.cfg.steps_per_epoch:
                    n_steps = min(n_steps, self.cfg.steps_per_epoch)
                T = max(1, min(cfg.steps_per_call, n_steps))
                for s0 in range(0, n_steps - n_steps % T, T):
                    idxs = jnp.asarray(
                        order[s0 * cfg.bs:(s0 + T) * cfg.bs]
                        .astype(np.int32).reshape(T, cfg.bs))
                    data_key, k = jax.random.split(data_key)
                    self.state, metrics = step_from_idx(self.state, idxs, k)
                    if dog:
                        dog.beat()
                    global_step += T
                    rate = None
                    for _ in range(T):
                        rate = timer.tick() or rate
                    if rate:
                        self.log("throughput: %.2f steps/s, %.0f pts/s, "
                                 "%.1f ms/step" % (rate["steps_per_sec"],
                                                   rate["points_per_sec"],
                                                   rate["ms_per_step"]))
                    if cfg.save and global_step % 20 < T:
                        self.dump_samples(epoch, global_step)
                    if global_step % cfg.log_every < T and metrics is not None:
                        m = jax.device_get(metrics)
                        d_meter.update(float(m["d_loss"]))
                        g_meter.update(float(m["g_loss"]))
                        ra_meter.update(float(m["real_acc"]))
                        fa_meter.update(float(m["fake_acc"]))
                rem = n_steps % T
                if rem:
                    idxs = jnp.asarray(
                        order[(n_steps - rem) * cfg.bs:n_steps * cfg.bs]
                        .astype(np.int32).reshape(rem, cfg.bs))
                    data_key, k = jax.random.split(data_key)
                    self.state, metrics = step_from_idx(self.state, idxs, k)
                    global_step += rem
                if d_meter.count == 0 and metrics is not None:
                    # short epochs (< log_every steps) never hit the gated
                    # meter update; fold in the final step so the epoch
                    # summary reports real numbers
                    m = jax.device_get(metrics)
                    d_meter.update(float(m["d_loss"]))
                    g_meter.update(float(m["g_loss"]))
                    ra_meter.update(float(m["real_acc"]))
                    fa_meter.update(float(m["fake_acc"]))
                dt = time.time() - t_start
                self.log("Epoch: [%2d] time: %2dm %2ds d_loss: %.8f, "
                         "g_loss: %.8f" % (epoch, dt / 60, dt % 60,
                                           d_meter.avg, g_meter.avg))
                self.log("real_acc: %f  fake_acc: %f"
                         % (ra_meter.avg, fa_meter.avg))
                if cfg.eval_every and epoch % cfg.eval_every == 0:
                    self.evaluate(epoch, global_step)
                if epoch % cfg.snapshot == 0:
                    save_checkpoint(cfg.log_dir, self.state, epoch, cfg)
                if dog:
                    dog.beat()      # eval/checkpoint epochs run long
                continue

            batches = prefetch_to_device(
                self.dataset.epoch_batches(rng_np, cfg.bs), size=2,
                sharding=sharding)
            for real in batches:
                if self._augment is not None:
                    aug_key, k = jax.random.split(aug_key)
                    real = self._augment(k, real)
                self.state, metrics = self.train_step(self.state, real)
                if dog:
                    dog.beat()
                global_step += 1
                rate = timer.tick()
                if rate:
                    self.log("throughput: %.2f steps/s, %.0f pts/s, "
                             "%.1f ms/step" % (rate["steps_per_sec"],
                                               rate["points_per_sec"],
                                               rate["ms_per_step"]))
                if cfg.save and global_step % 20 == 0:
                    self.dump_samples(epoch, global_step)
                if global_step % cfg.log_every == 0 and metrics is not None:
                    m = jax.device_get(metrics)
                    d_meter.update(float(m["d_loss"]))
                    g_meter.update(float(m["g_loss"]))
                    ra_meter.update(float(m["real_acc"]))
                    fa_meter.update(float(m["fake_acc"]))

            if d_meter.count == 0 and metrics is not None:
                m = jax.device_get(metrics)
                d_meter.update(float(m["d_loss"]))
                g_meter.update(float(m["g_loss"]))
                ra_meter.update(float(m["real_acc"]))
                fa_meter.update(float(m["fake_acc"]))
            dt = time.time() - t_start
            self.log("Epoch: [%2d] time: %2dm %2ds d_loss: %.8f, g_loss: %.8f"
                     % (epoch, dt / 60, dt % 60, d_meter.avg, g_meter.avg))
            self.log("real_acc: %f  fake_acc: %f" % (ra_meter.avg, fa_meter.avg))

            if cfg.eval_every and epoch % cfg.eval_every == 0:
                self.evaluate(epoch, global_step)
            if epoch % cfg.snapshot == 0:
                save_checkpoint(cfg.log_dir, self.state, epoch, cfg)
            if dog:
                dog.beat()

        if dog:
            dog.stop()
        save_checkpoint(cfg.log_dir, self.state, max_epoch, cfg)
        return self.state

    # ------------------------------------------------------------------
    def generate(self, n: int, seed: int = 0, batch: int = 64) -> np.ndarray:
        """Batch generation (model_test.simple_gen equivalent): [n, N, 3]."""
        outs = []
        key = jax.random.PRNGKey(seed)
        for lo in range(0, n, batch):
            bs = min(batch, n - lo)
            key, kz = jax.random.split(key)
            z = sample_z(kz, bs, self.cfg.np, self.cfg.nz, self.cfg.nv,
                         self.cfg.n_rand)
            outs.append(np.asarray(self.sample_fn(self.state, z)))
        return np.concatenate(outs, axis=0)

    def dump_samples(self, epoch: int, step: int, grid=(8, 8)):
        """Periodic sample dump (model.py:371-410): an 8x8 grid PNG plus
        per-sample .xyz files under log_dir/plot."""
        from sp_gan_tpu.data.augment import normalize_point_cloud
        from sp_gan_tpu.viz import plot_grid, save_xyz

        eval_dir = os.path.join(self.cfg.log_dir, "plot")
        os.makedirs(eval_dir, exist_ok=True)
        rows = []
        for i in range(grid[0]):
            z = self.fix_z[i * grid[1]:(i + 1) * grid[1]]
            pcs = np.asarray(self.sample_fn(self.state, z))
            rows.append(0.75 * np.asarray(normalize_point_cloud(pcs)))
        plot_grid(os.path.join(eval_dir, f"{step}.png"), rows)
        for i, row in enumerate(rows):
            for j, pc in enumerate(row):
                sid = i * grid[1] + j
                d = os.path.join(eval_dir, "sample", str(sid))
                os.makedirs(d, exist_ok=True)
                save_xyz(os.path.join(d, f"{sid}_step_{step}.xyz"), pc)
