"""End-to-end Trainer tests on synthetic data (tiny shapes): full epoch loop,
logging artifacts, checkpointing, restore, generation."""

import json
import os

import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.data import SyntheticDataset
from sp_gan_tpu.train import Trainer


@pytest.fixture
def cfg(tmp_path):
    return Config(np=32, bs=4, nk=8, nz=16, max_epoch=2, snapshot=1,
                  log_dir=str(tmp_path / "run"), donate_state=False,
                  log_every=1)


@pytest.fixture
def dataset():
    return SyntheticDataset(n_items=8, n_points=32)


class TestTrainer:
    def test_two_epochs_end_to_end(self, cfg, dataset):
        tr = Trainer(cfg, dataset=dataset)
        state = tr.train()
        assert int(state.step) == 2 * (8 // 4)
        # artifacts
        assert os.path.exists(os.path.join(cfg.log_dir, "log_train.txt"))
        assert os.path.exists(os.path.join(cfg.log_dir, "args.txt"))
        assert os.path.exists(os.path.join(cfg.log_dir, "config.json"))
        ckpts = [f for f in os.listdir(cfg.log_dir) if f.endswith(".pkl")]
        assert len(ckpts) >= 2  # snapshot every epoch

    def test_restore_resumes(self, cfg, dataset):
        Trainer(cfg, dataset=dataset).train()
        cfg2 = cfg.replace(restore=True, max_epoch=3)
        tr2 = Trainer(cfg2, dataset=dataset)
        assert tr2.start_epoch == 3  # restored after epoch 2
        state = tr2.train()
        assert int(state.step) >= 2 * (8 // 4)

    def test_generate_from_trainer(self, cfg, dataset):
        tr = Trainer(cfg, dataset=dataset)
        pcs = tr.generate(5, seed=1)
        assert pcs.shape == (5, 32, 3)
        assert np.all(np.isfinite(pcs))

    def test_augment_path(self, cfg, dataset):
        tr = Trainer(cfg.replace(augment=True, max_epoch=1), dataset=dataset)
        state = tr.train()
        assert int(state.step) == 2

    def test_con_cls_wiring(self, tmp_path):
        """--con --cls 3 reaches H5Dataset: chair+table+bench concatenated
        (reference H5DataLoader.py:47-60)."""
        import h5py
        d = tmp_path / "32"
        d.mkdir()
        rng = np.random.default_rng(0)
        for cat in ("chair", "table", "bench"):
            with h5py.File(str(d / f"{cat}.h5"), "w") as f:
                f["poisson_32"] = rng.standard_normal((4, 32, 3)).astype(
                    np.float32)
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, con=True, cls=3,
                     data_root=str(tmp_path), log_dir=str(tmp_path / "run"),
                     donate_state=False)
        tr = Trainer(cfg)
        assert len(tr.dataset) == 12
        assert tr.dataset.labels is not None
        np.testing.assert_array_equal(np.unique(tr.dataset.labels), [0, 1, 2])
        # CLI spelling parses too
        from sp_gan_tpu.config import parse_args
        c = parse_args(["--con", "--cls", "3"])
        assert c.con and c.cls == 3

    def test_config_json_roundtrip(self, cfg):
        s = cfg.to_json()
        c2 = Config.from_json(s)
        assert c2 == cfg

    def test_synthetic_fallback_when_no_h5(self, tmp_path):
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=5,
                     data_root=str(tmp_path / "missing"),
                     log_dir=str(tmp_path / "run2"), donate_state=False)
        tr = Trainer(cfg)  # falls back to synthetic
        assert len(tr.dataset) > 0

    def test_chunked_stepping_covers_all_steps(self, tmp_path):
        """steps_per_call chunking (r2): main chunks + remainder chunk
        process exactly n_steps steps per epoch."""
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=10 ** 9,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     steps_per_call=4)
        ds = SyntheticDataset(n_items=4 * 10, n_points=32)  # 10 steps: 2x4+2
        tr = Trainer(cfg, dataset=ds)
        state = tr.train()
        assert int(state.step) == 10
        # second call reuses the cached jitted chunk (no recompile): the
        # callable object must be identical
        c1 = tr._chunk_step
        tr.train(max_epoch=1)
        assert tr._chunk_step is c1


class TestInLoopEval:
    def test_eval_hook_writes_metrics(self, tmp_path):
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=2, snapshot=2,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     eval_every=1, eval_size=6)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        tr.train()
        path = os.path.join(cfg.log_dir, "eval.jsonl")
        assert os.path.exists(path)
        records = [json.loads(l) for l in open(path)]
        assert len(records) == 2
        for rec in records:
            m = rec["raw"]
            for key in ("MMD-CD", "COV-CD", "1NN-CD", "JSD"):
                assert np.isfinite(m[key]), (key, m)
        assert records[0]["epoch"] == 1 and records[1]["epoch"] == 2
        # log_train.txt carries the EVAL lines too
        log = open(os.path.join(cfg.log_dir, "log_train.txt")).read()
        assert "EVAL epoch=1" in log

    def test_eval_hook_with_emd(self, tmp_path):
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     eval_every=1, eval_size=4, eval_emd=True)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        tr.cfg = tr.cfg.replace(eval_emd=True)
        rec = tr.evaluate(1, 1)
        for key in ("MMD-EMD", "COV-EMD", "1NN-EMD"):
            assert np.isfinite(rec["raw"][key]), key

    def test_eval_hook_ema_and_raw(self, tmp_path):
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     eval_every=1, eval_size=6, ema=True)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        tr.train()
        rec = json.loads(open(
            os.path.join(cfg.log_dir, "eval.jsonl")).readline())
        assert "ema" in rec and "raw" in rec
        assert np.isfinite(rec["ema"]["MMD-CD"])

    def test_best_checkpoint_tracking(self, tmp_path):
        """ckpt_best.pkl + best.json track the lowest in-loop MMD-CD and
        survive a restart (the incumbent is not re-beaten by a worse
        later eval)."""
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=2, snapshot=2,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     eval_every=1, eval_size=6, ema=True)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        tr.train()
        best_ckpt = os.path.join(cfg.log_dir, "ckpt_best.pkl")
        best_json = os.path.join(cfg.log_dir, "best.json")
        assert os.path.exists(best_ckpt) and os.path.exists(best_json)
        best = json.load(open(best_json))
        assert best["metric"] == "MMD-CD" and best["variant"] == "ema"
        records = [json.loads(l) for l in open(
            os.path.join(cfg.log_dir, "eval.jsonl"))]
        assert best["value"] == pytest.approx(
            min(r["ema"]["MMD-CD"] for r in records))
        # the best checkpoint is loadable like any other
        from sp_gan_tpu.train.checkpoint import load_checkpoint
        state2, epoch = load_checkpoint(best_ckpt, tr.state)
        assert epoch == best["epoch"]
        # restart restores the incumbent: a fresh Trainer with --restore
        # must not immediately overwrite best.json with a worse value
        tr2 = Trainer(cfg.replace(restore=True),
                      dataset=SyntheticDataset(n_items=8, n_points=32))
        assert tr2._best["value"] == pytest.approx(best["value"])

    def test_inloop_fpd_column(self, tmp_path):
        """cfg.fpd_weights adds a finite FPD column to eval.jsonl, built
        with the k/feat_dims stored in the extractor pickle."""
        import pickle

        import jax
        import jax.numpy as jnp
        from sp_gan_tpu.eval.dgcnn import DGCNNFeat

        model = DGCNNFeat(k=6, feat_dims=32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 3)))
        wpath = str(tmp_path / "fpd.pkl")
        with open(wpath, "wb") as f:
            pickle.dump({"params": variables["params"],
                         "batch_stats": variables["batch_stats"],
                         "k": 6, "feat_dims": 32}, f)
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     eval_every=1, eval_size=6, fpd_weights=wpath)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        rec = tr.evaluate(1, 1)
        assert np.isfinite(rec["raw"]["FPD"])
        assert tr._fpd.model.k == 6 and tr._fpd.model.feat_dims == 32


class TestWarmStart:
    def test_pretrain_model_g_d_warm_start(self, tmp_path):
        """--restore --pretrain_model_G/D x.pth loads converted reference
        weights and continues training (reference model.py:189-195)."""
        import torch

        from tests.test_torch_parity import TDiscriminator, TGenerator

        tg = TGenerator(nz=16, k=4).eval()
        td = TDiscriminator().eval()
        g_path = str(tmp_path / "300_Chair_G.pth")
        d_path = str(tmp_path / "300_Chair_D.pth")
        torch.save({"G_model": tg.state_dict(), "G_epoch": 300}, g_path)
        torch.save({"D_model": td.state_dict(), "D_epoch": 300}, d_path)

        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=301, snapshot=301,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     restore=True, pretrain_model_G=g_path,
                     pretrain_model_D=d_path, dtype="float32")
        ds = SyntheticDataset(n_items=8, n_points=32)
        tr = Trainer(cfg, dataset=ds)
        assert tr.start_epoch == 301
        # imported weights actually installed
        w_ref = tg.state_dict()["head.0.weight"].numpy()[:, :, 0].T
        np.testing.assert_allclose(
            np.asarray(tr.state.g_params["head1"]["kernel"]), w_ref,
            atol=1e-6)
        state = tr.train()          # one epoch from the warm start
        assert int(state.step) == 2

    def test_pretrain_model_resolves_relative_to_log_dir(self, tmp_path):
        """Bare filenames resolve against log_dir, like the reference's
        os.path.join(log_dir, pretrain_model_G) (model.py:470)."""
        run = tmp_path / "run"
        cfg0 = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                      log_dir=str(run), donate_state=False)
        ds = SyntheticDataset(n_items=8, n_points=32)
        Trainer(cfg0, dataset=ds).train()
        ckpts = sorted(f for f in os.listdir(run) if f.endswith(".pkl"))
        cfg = cfg0.replace(restore=True, pretrain_model_G=ckpts[-1],
                           max_epoch=2)
        tr = Trainer(cfg, dataset=ds)
        assert tr.start_epoch == 2


class TestEpochMeters:
    def test_epoch_summaries_use_fresh_meters(self, tmp_path):
        """Short epochs (fewer steps than log_every) rely on the final-step
        fallback; without the per-epoch meter reset every epoch after the
        first reprinted epoch-1's numbers verbatim (regression, r2)."""
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=3, snapshot=3,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     log_every=1000)   # never hit: forces the fallback
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        tr.train()
        lines = [l for l in open(os.path.join(cfg.log_dir, "log_train.txt"))
                 if l.startswith("Epoch:")]
        assert len(lines) == 3
        losses = [l.split("d_loss:")[1] for l in lines]
        assert len(set(losses)) == 3, f"stale epoch summaries: {lines}"


class TestWatchdogArming:
    def test_watchdog_armed_before_backend_init(self, cfg, dataset,
                                                monkeypatch):
        """The hang watchdog must be armed before the first statement that
        can touch the device backend. enable_compile_cache() calls
        jax.default_backend() — backend init — which blocks forever inside
        the runtime's connect-retry loop when the device relay is down; if
        it runs first, a campaign restarted into a relay outage hangs with
        no exit-42 escape and wedges its supervisor (observed 2026-08-20,
        fixed by arming the watchdog first)."""
        import sp_gan_tpu.train.trainer as trainer_mod
        from sp_gan_tpu.utils.watchdog import Watchdog

        order = []
        real_cache = trainer_mod.enable_compile_cache
        real_start = Watchdog.start

        def spy_cache(*a, **kw):
            order.append("backend_init")
            return real_cache(*a, **kw)

        def spy_start(self):
            order.append("watchdog_armed")
            return real_start(self)

        monkeypatch.setattr(trainer_mod, "enable_compile_cache", spy_cache)
        monkeypatch.setattr(Watchdog, "start", spy_start)
        tr = Trainer(cfg.replace(watchdog_secs=3600), dataset=dataset)
        try:
            assert order.index("watchdog_armed") < order.index("backend_init")
        finally:
            if tr._dog is not None:
                tr._dog.stop()
