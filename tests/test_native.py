"""Native (C++) host-runtime tests: build, parse/save roundtrip, batch
assembly semantics, and thread-count invariance."""

import numpy as np
import pytest

from sp_gan_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    native._load()
    yield


class TestBuild:
    def test_library_builds(self):
        assert native._load() is not None, "g++ build of spgan_native failed"
        assert native.HAS_NATIVE


class TestParse:
    def test_roundtrip(self, tmp_path, rng):
        pc = rng.standard_normal((257, 3)).astype(np.float32)
        p = str(tmp_path / "a.xyz")
        np.savetxt(p, pc, fmt="%.6f")
        out = native.parse_xyz(p)
        np.testing.assert_allclose(out, pc, atol=1e-5)

    def test_extra_columns_ignored(self, tmp_path, rng):
        pc = rng.standard_normal((31, 6)).astype(np.float32)
        p = str(tmp_path / "a.xyz")
        np.savetxt(p, pc, fmt="%.6f")
        out = native.parse_xyz(p, cols=3)
        np.testing.assert_allclose(out, pc[:, :3], atol=1e-5)

    def test_save_fast_roundtrip(self, tmp_path, rng):
        pc = rng.standard_normal((100, 3)).astype(np.float32)
        p = str(tmp_path / "b.xyz")
        assert native.save_xyz_fast(p, pc) == 100
        np.testing.assert_allclose(np.loadtxt(p), pc, atol=1e-5)

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            native.parse_xyz("/nonexistent/file.xyz")


class TestAssemble:
    def test_gathers_correct_items(self, rng):
        data = rng.standard_normal((10, 32, 3)).astype(np.float32)
        idx = np.array([3, 7, 3], np.int64)
        out = native.assemble_batch(data, idx, seed=42)
        assert out.shape == (3, 32, 3)
        for i, j in enumerate(idx):
            # same point set, permuted order
            a = set(map(tuple, np.round(out[i], 5)))
            b = set(map(tuple, np.round(data[j], 5)))
            assert a == b

    def test_items_get_distinct_permutations(self, rng):
        data = rng.standard_normal((2, 64, 3)).astype(np.float32)
        idx = np.array([0, 0], np.int64)
        out = native.assemble_batch(data, idx, seed=1)
        assert not np.array_equal(out[0], out[1])

    def test_seed_determinism(self, rng):
        data = rng.standard_normal((4, 32, 3)).astype(np.float32)
        idx = np.arange(4, dtype=np.int64)
        a = native.assemble_batch(data, idx, seed=9, n_threads=1)
        b = native.assemble_batch(data, idx, seed=9, n_threads=1)
        np.testing.assert_array_equal(a, b)

    def test_multithreaded_valid(self, rng):
        data = rng.standard_normal((64, 128, 3)).astype(np.float32)
        idx = rng.integers(0, 64, 32).astype(np.int64)
        out = native.assemble_batch(data, idx, seed=5, n_threads=8)
        for i, j in enumerate(idx):
            assert set(map(tuple, np.round(out[i], 4))) == \
                set(map(tuple, np.round(data[j], 4)))
