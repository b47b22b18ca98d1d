"""C++ data-plane: builds, matches the numpy reference path exactly."""

import numpy as np
import pytest

from uformer_tpu.data.native import augment_pair_batch, native_available
from uformer_tpu.data.datasets import _apply_dihedral

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable")


def test_native_matches_numpy_all_ops():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 256, (40, 56, 3), np.uint8)
    noisy = rng.integers(0, 256, (40, 56, 3), np.uint8)
    ps = 16
    rows = np.arange(8) % (40 - ps + 1)
    cols = (np.arange(8) * 3) % (56 - ps + 1)
    ks = np.arange(8)
    g_out, n_out = augment_pair_batch([gt] * 8, [noisy] * 8, ps, rows, cols, ks)
    for i in range(8):
        r, c, k = int(rows[i]), int(cols[i]), int(ks[i])
        want_g = _apply_dihedral(
            gt[r:r + ps, c:c + ps].astype(np.float32) / 255.0, k)
        want_n = _apply_dihedral(
            noisy[r:r + ps, c:c + ps].astype(np.float32) / 255.0, k)
        np.testing.assert_allclose(g_out[i], want_g, atol=1e-6,
                                   err_msg=f"op {k}")
        np.testing.assert_allclose(n_out[i], want_n, atol=1e-6,
                                   err_msg=f"op {k}")


def test_native_dataset_batch_matches_python_path(tmp_path):
    import cv2

    from uformer_tpu.data.datasets import PairedTrainDataset

    rng = np.random.default_rng(0)
    (tmp_path / "groundtruth").mkdir()
    (tmp_path / "input").mkdir()
    for i in range(4):
        img = rng.integers(0, 256, (48, 48, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "groundtruth" / f"{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(tmp_path / "input" / f"{i}.png"),
                    cv2.cvtColor(img // 2, cv2.COLOR_RGB2BGR))

    ds_nat = PairedTrainDataset(str(tmp_path), patch_size=32, seed=7,
                                native=True)
    ds_py = PairedTrainDataset(str(tmp_path), patch_size=32, seed=7,
                               native=False)
    g1, n1 = ds_nat.get_batch([0, 1, 2, 3])
    g2, n2 = ds_py.get_batch([0, 1, 2, 3])
    np.testing.assert_allclose(g1, g2, atol=1e-6)
    np.testing.assert_allclose(n1, n2, atol=1e-6)


def test_batch_augment_deterministic_under_thread_jitter(tmp_path, monkeypatch):
    """Crop/aug draws must not depend on decode-thread interleaving: two
    same-seed datasets give identical batches even when decode latencies
    are randomized (the old code drew RNG inside pool workers, so batch
    content changed with machine load)."""
    import time

    import cv2

    import uformer_tpu.data.datasets as dsmod

    rng = np.random.default_rng(0)
    (tmp_path / "groundtruth").mkdir()
    (tmp_path / "input").mkdir()
    for i in range(6):
        img = rng.integers(0, 256, (48, 48, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "groundtruth" / f"{i}.png"), img)
        cv2.imwrite(str(tmp_path / "input" / f"{i}.png"), img)

    real = dsmod.load_img
    jit = np.random.default_rng(123)

    def slow_load(path):
        time.sleep(float(jit.uniform(0, 0.02)))
        return real(path)

    monkeypatch.setattr(dsmod, "load_img", slow_load)
    a = dsmod.PairedTrainDataset(str(tmp_path), patch_size=32, seed=9,
                                 native=False, decode_threads=6)
    b = dsmod.PairedTrainDataset(str(tmp_path), patch_size=32, seed=9,
                                 native=False, decode_threads=6)
    ga, na = a.get_batch([0, 3, 1, 5, 2, 4])
    gb, nb = b.get_batch([0, 3, 1, 5, 2, 4])
    np.testing.assert_array_equal(ga, gb)
    np.testing.assert_array_equal(na, nb)
