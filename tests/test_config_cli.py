"""Config CLI parsing: reference flag names resolve, booleans toggle, types
coerce."""

import pytest

from sp_gan_tpu.config import Config, parse_args


class TestParseArgs:
    def test_defaults(self):
        cfg = parse_args([])
        assert cfg == Config()

    def test_reference_flag_names(self):
        cfg = parse_args(["--choice", "Airplane", "--np", "1024", "--bs",
                          "64", "--nk", "16", "--nz", "64", "--gan", "wgan",
                          "--lr_g", "2e-4", "--max_epoch", "100"])
        assert cfg.choice == "Airplane"
        assert cfg.np == 1024 and cfg.bs == 64
        assert cfg.k == 8
        assert cfg.gan == "wgan"
        assert cfg.lr_g == pytest.approx(2e-4)

    def test_boolean_flags(self):
        cfg = parse_args(["--attn", "--off", "--z_norm", "--no-use_pallas"])
        assert cfg.attn and cfg.off and cfg.z_norm
        assert not cfg.use_pallas

    def test_mesh_shape(self):
        cfg = parse_args(["--mesh_shape", "2", "4"])
        assert cfg.mesh_shape == (2, 4)

    def test_json_roundtrip_from_cli(self):
        cfg = parse_args(["--choice", "Table", "--dtype", "float32"])
        assert Config.from_json(cfg.to_json()) == cfg


class TestMultiClassDataset:
    def test_con_concatenates_with_labels(self, tmp_path):
        import os
        import h5py
        import numpy as np
        from sp_gan_tpu.data import H5Dataset
        d = str(tmp_path / "32")
        os.makedirs(d)
        rng = np.random.default_rng(0)
        for i, cat in enumerate(("chair", "table")):
            with h5py.File(os.path.join(d, f"{cat}.h5"), "w") as f:
                f.create_dataset("poisson_32",
                                 data=rng.standard_normal((3 + i, 32, 3)))
        ds = H5Dataset(str(tmp_path), "ignored", n_points=32, con=True, cls=2)
        assert len(ds) == 7
        assert ds.labels is not None
        assert set(ds.labels.tolist()) == {0, 1}


class TestConfigCompat:
    def test_from_json_ignores_unknown_keys(self):
        import json
        d = json.loads(Config().to_json())
        d["future_flag_xyz"] = 42
        cfg = Config.from_json(json.dumps(d))
        assert cfg == Config()

    def test_from_json_defaults_missing_keys(self):
        cfg = Config.from_json('{"choice": "Table"}')
        assert cfg.choice == "Table"
        assert cfg.np == 2048
