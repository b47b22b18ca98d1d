"""Eval stack tests: metrics golden checks, padding round-trips, tiled
inference, SIDD scorer, DND bundling, RealBlur alignment."""

import os

import numpy as np
import pytest

from uformer_tpu.eval import (
    batch_psnr,
    expand2square,
    pad_to_multiple,
    psnr_255,
    psnr_b,
    psnr_clamped,
    rgb2ycbcr,
    sidd_psnr,
    sidd_ssim,
    ssim_255,
    ssim_gaussian_map,
    ssim_uniform,
    tiled_inference,
    unexpand,
    unpad,
)


def _imgs(seed=0, shape=(32, 32, 3), noise=0.05):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0, 1, shape).astype(np.float32)
    noisy = np.clip(gt + noise * rng.normal(size=shape).astype(np.float32), 0, 1)
    return gt, noisy


def test_psnr_clamped_formula():
    gt, noisy = _imgs()
    got = float(psnr_clamped(noisy, gt))
    want = 20 * np.log10(1.0 / np.sqrt(np.mean((noisy - gt) ** 2)))
    assert abs(got - want) < 1e-4


def test_batch_psnr_sum_quirk():
    gt, noisy = _imgs(shape=(4, 16, 16, 3))
    s = float(batch_psnr(noisy, gt, average=False))
    m = float(batch_psnr(noisy, gt, average=True))
    assert abs(s - 4 * m) < 1e-3


def test_psnr_255_matches_reference_formula():
    gt, noisy = _imgs()
    a, b = gt * 255, noisy * 255
    got = psnr_255(a, b)
    want = 20 * np.log10(255.0 / np.sqrt(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)))
    assert abs(got - want) < 1e-8


def test_ssim_255_matches_cv2_reference_impl():
    """Cross-check the scipy SSIM against an independent cv2.filter2D
    implementation of the same (reference) formula."""
    cv2 = pytest.importorskip("cv2")
    gt, noisy = _imgs(shape=(48, 48, 3), noise=0.1)
    a = np.round(gt * 255).astype(np.uint8).astype(np.float64)
    b = np.round(noisy * 255).astype(np.uint8).astype(np.float64)

    def cv2_ssim_1ch(i1, i2):
        C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        k = cv2.getGaussianKernel(11, 1.5)
        w = np.outer(k, k.T)
        f = lambda x: cv2.filter2D(x, -1, w)[5:-5, 5:-5]  # noqa: E731
        mu1, mu2 = f(i1), f(i2)
        s1 = f(i1 ** 2) - mu1 ** 2
        s2 = f(i2 ** 2) - mu2 ** 2
        s12 = f(i1 * i2) - mu1 * mu2
        return (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean()

    want = np.mean([cv2_ssim_1ch(a[..., c], b[..., c]) for c in range(3)])
    got = ssim_255(gt, noisy)
    assert abs(got - want) < 2e-4, (got, want)


def test_ssim_uniform_matches_skimage_formula():
    gt, noisy = _imgs(shape=(40, 40, 3), noise=0.08)
    v = ssim_uniform(noisy, gt)
    assert 0 < v < 1
    assert ssim_uniform(gt, gt) == pytest.approx(1.0)


def test_sidd_protocol():
    gt, noisy = _imgs(shape=(64, 64, 3))
    p = sidd_psnr(noisy, gt)
    want = 10 * np.log10(1.0 / np.mean(
        (noisy.astype(np.float64) - gt.astype(np.float64)) ** 2))
    assert abs(p - want) < 1e-8
    s = sidd_ssim(noisy, gt)
    assert 0 < s < 1 and sidd_ssim(gt, gt) == pytest.approx(1.0)


def test_psnr_b_penalizes_blocking():
    # piecewise-constant 8x8 tiles: all edges land exactly on block
    # boundaries -> strictly positive blocking-effect factor
    rng = np.random.default_rng(0)
    tiles = rng.uniform(60, 200, (8, 8))
    blocky = np.kron(tiles, np.ones((8, 8)))
    gt = blocky + rng.normal(0, 2, blocky.shape)
    assert psnr_b(gt, blocky) < psnr_255(gt, blocky)


def test_rgb2ycbcr_range():
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3))
    y = rgb2ycbcr(img, y_only=True)
    assert y.min() >= 16 / 255 - 1e-6 and y.max() <= 235 / 255 + 1e-6


def test_expand2square_roundtrip():
    gt, _ = _imgs(shape=(40, 72, 3))
    x = gt[None]
    padded, mask = expand2square(x, factor=32)
    assert padded.shape == (1, 96, 96, 3)
    assert float(mask.sum()) == 40 * 72
    back = unexpand(padded, (40, 72), 32)
    np.testing.assert_array_equal(back[0], gt)


def test_pad_to_multiple_roundtrip():
    gt, _ = _imgs(shape=(40, 72, 3))
    padded, orig = pad_to_multiple(gt[None], 32)
    assert padded.shape == (1, 64, 96, 3)
    np.testing.assert_array_equal(unpad(padded, orig)[0], gt)


def test_tiled_inference_identity():
    gt, _ = _imgs(shape=(100, 180, 3))
    out = tiled_inference(lambda x: x, gt[None], tile=64, overlap=16, factor=32)
    np.testing.assert_allclose(out[0], gt, atol=1e-6)


def test_tiled_inference_matches_whole_on_conv_model():
    """A local (conv) model must produce near-identical outputs tiled vs
    whole when overlap exceeds the receptive-field halo."""
    from scipy.ndimage import uniform_filter

    def fn(x):  # 5x5 box blur, local op with 2px halo
        return np.stack([
            np.stack([uniform_filter(x[b, ..., c], 5) for c in range(3)], -1)
            for b in range(x.shape[0])])

    gt, _ = _imgs(shape=(96, 160, 3))
    whole = fn(gt[None])
    tiled = tiled_inference(fn, gt[None], tile=64, overlap=16, factor=32)
    interior = (slice(None), slice(4, -4), slice(4, -4))
    np.testing.assert_allclose(tiled[interior], whole[interior], atol=1e-5)


def test_sidd_scorer_and_submission(tmp_path):
    import scipy.io as sio

    from uformer_tpu.eval.sidd import (
        load_sidd_val_gt, load_sidd_val_noisy, restore_sidd,
        save_sidd_submission, score_sidd)

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (2, 3, 32, 32, 3)).astype(np.float32)
    noisy = np.clip(gt + 0.1 * rng.normal(size=gt.shape), 0, 1)
    sio.savemat(tmp_path / "ValidationNoisyBlocksSrgb.mat",
                {"ValidationNoisyBlocksSrgb": np.uint8(noisy * 255)})
    sio.savemat(tmp_path / "ValidationGtBlocksSrgb.mat",
                {"ValidationGtBlocksSrgb": np.uint8(gt * 255)})

    loaded = load_sidd_val_noisy(str(tmp_path))
    assert loaded.shape == noisy.shape and loaded.max() <= 1.0

    restored = restore_sidd(lambda x: x, loaded)  # identity restorer
    save_sidd_submission(restored, str(tmp_path / "res"))
    out = sio.loadmat(tmp_path / "res" / "Idenoised.mat")["Idenoised"]
    assert out.shape == noisy.shape

    p_id, s_id = score_sidd(restored, load_sidd_val_gt(str(tmp_path)))
    p_gt, s_gt = score_sidd(load_sidd_val_gt(str(tmp_path)),
                            load_sidd_val_gt(str(tmp_path)))
    assert p_gt == float("inf") or p_gt > 80
    assert p_id < p_gt and 0 < s_id < 1


def test_dnd_bundling(tmp_path):
    import scipy.io as sio

    from uformer_tpu.eval.bundle import bundle_submissions_srgb_v1

    rng = np.random.default_rng(0)
    for i in range(50):
        for b in range(20):
            sio.savemat(tmp_path / ("%04d_%02d.mat" % (i + 1, b + 1)),
                        {"Idenoised_crop": rng.uniform(0, 1, (4, 4, 3))
                         .astype(np.float32)})
    bundle_submissions_srgb_v1(str(tmp_path))
    out = sio.loadmat(tmp_path / "bundled" / "0001.mat")
    assert out["Idenoised"].shape == (1, 20) or out["Idenoised"].shape == (20,)
    assert bool(out["israw"].squeeze()) is False


def test_realblur_alignment_recovers_shift():
    cv2 = pytest.importorskip("cv2")
    from uformer_tpu.eval.realblur import image_align, masked_psnr, masked_ssim

    rng = np.random.default_rng(0)
    # smooth structured image so ECC converges
    base = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    gt = np.stack([cv2.resize(base[..., c], (128, 128),
                              interpolation=cv2.INTER_CUBIC)
                   for c in range(3)], -1).astype(np.float32)
    gt = np.clip(gt, 0, 1)
    M = np.float32([[1, 0, 2.0], [0, 1, -1.5]])  # 2px shift
    shifted = cv2.warpAffine(gt, M, (128, 128), flags=cv2.INTER_CUBIC,
                             borderMode=cv2.BORDER_REFLECT)
    psnr_before = 10 * np.log10(1.0 / np.mean((shifted - gt) ** 2))
    zr, xr, cr, _ = image_align(shifted, gt)
    psnr_after = masked_psnr(xr, zr, cr, data_range=1.0)
    assert psnr_after > psnr_before + 5, (psnr_before, psnr_after)
    s = masked_ssim(xr, zr, cr)
    assert 0.8 < s <= 1.0


def test_ssim_gaussian_map_full_and_mean():
    gt, noisy = _imgs(shape=(64, 64, 3), noise=0.05)
    mean, smap = ssim_gaussian_map(noisy, gt)
    assert smap.shape == (64, 64, 3)
    assert 0 < mean < 1


def test_run_gopro_eval_reference_ssim_protocol(tmp_path):
    """run_gopro_eval must reproduce the reference script's SSIM numbers:
    legacy skimage structural_similarity on float input uses
    data_range = dtype range = 2.0 (test_gopro_hide.py:106), NOT 1.0."""
    import cv2
    from uformer_tpu.eval.gopro_hide import run_gopro_eval

    gt_dir = tmp_path / "groundtruth"
    in_dir = tmp_path / "input"
    gt_dir.mkdir()
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (40, 48, 3))
    noisy = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
    for d, img in ((gt_dir, gt), (in_dir, noisy)):
        cv2.imwrite(str(d / "0.png"), cv2.cvtColor(
            np.uint8(img * 255), cv2.COLOR_RGB2BGR))

    identity = lambda x: np.asarray(x)  # noqa: E731
    res = tmp_path / "results"
    _, ms = run_gopro_eval(identity, str(tmp_path), str(res),
                           save_images=False, factor=8)
    # independently recompute with the reference data_range
    from uformer_tpu.eval.image_io import load_img
    g = load_img(str(gt_dir / "0.png"))
    n = load_img(str(in_dir / "0.png"))
    want = ssim_uniform(np.clip(n, 0, 1), g, multichannel=True,
                        data_range=2.0)
    assert ms == pytest.approx(want, abs=1e-12)
    # and it must NOT be the data_range=1.0 value
    wrong = ssim_uniform(np.clip(n, 0, 1), g, multichannel=True,
                         data_range=1.0)
    assert abs(ms - wrong) > 1e-4
    assert os.path.exists(res / "psnr_ssim.txt")


def test_tiled_inference_batched_chunks():
    """Batched tile dispatch (incl. a repeat-padded last chunk) matches
    the whole-image result on a batch-equivariant fn, non-square input."""
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (2, 200, 360, 3)).astype(np.float32)
    calls = []

    def f(x):
        calls.append(x.shape)
        return x * 0.5 + 0.1

    out = tiled_inference(f, img, tile=64, overlap=16, factor=32,
                          tile_batch=3)
    np.testing.assert_allclose(out, img * 0.5 + 0.1, atol=1e-6)
    # every dispatch is the same compiled shape, batch = tile_batch
    # (flattened over tile positions x images)
    assert len(set(calls)) == 1 and calls[0][0] == 3


@pytest.mark.slow
def test_sidd_eval_end_to_end_with_real_model(tmp_path):
    """Full SIDD protocol through `run_sidd_eval` with the REAL Uformer_B
    (seeded golden weights, 128² blocks): restorer batching, submission
    .mat, scoring, psnr_ssim.txt. The released-checkpoint parity run
    itself needs artifacts this environment cannot fetch (BASELINE.md)
    — this pins the full protocol around the model so only the weight
    file differs when someone runs scripts/test_sidd.py for real.
    (VERDICT round 3 item 6.)"""
    import json

    import scipy.io as sio
    import jax
    import jax.numpy as jnp

    from tests.golden.generate import UFORMER_B, seeded_state_dict
    from tests.test_golden_parity import GOLDEN_DIR, _build
    from uformer_tpu.convert import convert_uformer
    from uformer_tpu.eval.sidd import run_sidd_eval, score_sidd

    data = np.load(os.path.join(GOLDEN_DIR, "uformer_b_128.npz"))
    sd = seeded_state_dict(json.loads(str(data["sd_manifest"])),
                           int(data["seed"]))
    model = _build(UFORMER_B)
    params = jax.tree_util.tree_map(jnp.asarray, convert_uformer(sd))
    fwd = jax.jit(lambda x: jnp.clip(model.apply(params, x), 0.0, 1.0))

    rng = np.random.default_rng(7)
    gt = rng.uniform(0, 1, (2, 2, 128, 128, 3)).astype(np.float32)
    noisy = np.clip(gt + 0.08 * rng.normal(size=gt.shape), 0, 1)
    sio.savemat(tmp_path / "ValidationNoisyBlocksSrgb.mat",
                {"ValidationNoisyBlocksSrgb": np.uint8(noisy * 255 + .5)})
    sio.savemat(tmp_path / "ValidationGtBlocksSrgb.mat",
                {"ValidationGtBlocksSrgb": np.uint8(gt * 255 + .5)})

    res = run_sidd_eval(lambda x: fwd(jnp.asarray(x)),
                        str(tmp_path), str(tmp_path / "out"))
    assert res is not None
    psnr, ssim = res
    assert np.isfinite(psnr) and 0 < ssim <= 1
    assert os.path.exists(tmp_path / "out" / "psnr_ssim.txt")

    sub = sio.loadmat(tmp_path / "out" / "Idenoised.mat")["Idenoised"]
    assert sub.shape == noisy.shape and sub.dtype == np.float32
    # submission blocks must be exactly clip(model(noisy)) on the
    # uint8-quantized inputs the protocol loads
    n0 = np.float32(np.uint8(noisy * 255 + .5)) / 255.0
    want = np.asarray(fwd(jnp.asarray(n0[0])))
    np.testing.assert_allclose(sub[0], want, atol=2e-5)
    # and the returned score is the official scorer over those blocks
    g0 = np.float32(np.uint8(gt * 255 + .5)) / 255.0
    p2, s2 = score_sidd(sub, g0)
    assert psnr == pytest.approx(p2) and ssim == pytest.approx(s2)
