"""Unit tests for window ops, masks, and relative position index."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.ops import (
    cyclic_shift,
    cyclic_unshift,
    window_partition,
    window_reverse,
    shift_window_mask,
    input_mask_bias,
    relative_position_index,
    gather_bias,
)


def test_partition_reverse_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)).astype(np.float32))
    w = window_partition(x, 8)
    assert w.shape == (2 * 2 * 3, 64, 5)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_ordering():
    # windows enumerate (h-block, w-block) row-major; tokens row-major
    H = W = 4
    win = 2
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    w = window_partition(x, win)
    # first window = top-left 2x2 block: values 0,1,4,5
    np.testing.assert_array_equal(np.asarray(w[0, :, 0]), [0, 1, 4, 5])
    # second window = top-right block
    np.testing.assert_array_equal(np.asarray(w[1, :, 0]), [2, 3, 6, 7])


def test_cyclic_shift_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = cyclic_unshift(cyclic_shift(x, 3), 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # shift moves (i, j) -> (i - s, j - s) mod H
    s = 2
    y = cyclic_shift(x, s)
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), np.asarray(x[0, s, s]))


def test_shift_mask_matches_torch_reference_construction():
    """Golden re-derivation of the 9-region mask (model.py:924-942) in torch
    semantics, computed independently here with numpy slicing."""
    H = W = 16
    win, shift = 8, 4
    region = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for w_ in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            region[:, h, w_, :] = cnt
            cnt += 1
    r = region.reshape(H // win, win, W // win, win).transpose(0, 2, 1, 3)
    r = r.reshape(-1, win * win)
    expected = r[:, None, :] - r[:, :, None]
    expected = np.where(expected != 0, -100.0, 0.0).astype(np.float32)

    got = shift_window_mask(H, W, win, shift)
    np.testing.assert_array_equal(got, expected)
    assert got.shape == (4, 64, 64)


def test_shift_mask_zero_diag_and_symmetric_sparsity():
    m = shift_window_mask(32, 32, 8, 4)
    assert (np.diagonal(m, axis1=1, axis2=2) == 0).all()
    # first window (interior) is fully unmasked
    assert (m[0] == 0).all()


def test_relative_position_index_properties():
    idx = relative_position_index(8, 8)
    assert idx.shape == (64, 64)
    assert idx.min() == 0 and idx.max() == 15 * 15 - 1
    # center of table at self-pairs
    assert (np.diagonal(idx) == (7 * 15 + 7)).all()
    # translation invariance: pairs with equal offset share the index
    assert idx[0, 9] == idx[9, 18]


def test_gather_bias_shape():
    table = jnp.asarray(np.random.default_rng(1).normal(size=(15 * 15, 4)))
    b = gather_bias(table, 8, 8)
    assert b.shape == (4, 64, 64)


def test_input_mask_bias():
    # one masked (nonzero) pixel -> -100 on its row/col pairs with other
    # nonzero pixels only (reference quirk: nonzero*nonzero -> -100)
    m = np.zeros((1, 1, 8, 8), np.float32)
    m[0, 0, 0, 0] = 1.0
    m[0, 0, 0, 1] = 1.0
    bias = input_mask_bias(jnp.asarray(m), 8, 8, 8)
    bias = np.asarray(bias)
    assert bias.shape == (1, 64, 64)
    assert bias[0, 0, 1] == -100.0 and bias[0, 1, 0] == -100.0
    assert bias[0, 0, 0] == -100.0  # self-pair of nonzero is also nonzero
    assert bias[0, 0, 2] == 0.0 and bias[0, 2, 3] == 0.0


@pytest.mark.parametrize("d", [2, 3])
def test_dilated_partition_matches_unfold(d):
    """Dilated partition == F.unfold(kernel=win, dilation=d,
    padding=4*(d-1), stride=win) (reference model.py:706-711)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    B, H, W, C, win = 2, 64, 64, 5, 8
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    ours = np.asarray(window_partition(jnp.asarray(x), win, dilation_rate=d))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # B, C, H, W
    u = F.unfold(xt, kernel_size=win, dilation=d, padding=4 * (d - 1),
                 stride=win)                       # B, C*win*win, nW
    ref = (u.permute(0, 2, 1).contiguous().view(-1, C, win, win)
            .permute(0, 2, 3, 1).contiguous().numpy()
            .reshape(-1, win * win, C))
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


@pytest.mark.parametrize("d", [2, 3])
def test_dilated_reverse_matches_fold(d):
    """Dilated reverse == the F.fold the reference intends (its own code
    at model.py:721-723 crashes on a 4-D permute with six indices)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    B, H, W, C, win = 2, 64, 64, 3, 8
    nW = (H // win) * (W // win)
    w = rng.normal(size=(B * nW, win * win, C)).astype(np.float32)
    ours = np.asarray(window_reverse(jnp.asarray(w), win, H, W,
                                     dilation_rate=d))

    # windows -> the (B, C*win*win, nW) layout F.fold consumes
    wt = (torch.from_numpy(w).view(B, nW, win, win, C)
          .permute(0, 4, 2, 3, 1).contiguous().view(B, C * win * win, nW))
    ref = F.fold(wt, (H, W), kernel_size=win, dilation=d,
                 padding=4 * (d - 1), stride=win)
    ref = ref.permute(0, 2, 3, 1).contiguous().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("p", [2, 4])
def test_packed_view_glue_identical(p):
    """The packed-view partition/reverse/shift variants are bytes-identical
    to the plain ones (the relayouts just run on full-lane views)."""
    from uformer_tpu.ops.window import (
        cyclic_shift_packed,
        cyclic_unshift_packed,
        window_partition_packed,
        window_reverse_packed,
    )

    rng = np.random.default_rng(p)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 32)).astype(np.float32))
    a = window_partition(x, 8)
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(window_partition_packed(x, 8, p)))
    np.testing.assert_array_equal(
        np.asarray(window_reverse(a, 8, 16, 24)),
        np.asarray(window_reverse_packed(a, 8, 16, 24, p)))
    np.testing.assert_array_equal(
        np.asarray(cyclic_shift(x, 4)),
        np.asarray(cyclic_shift_packed(x, 4, p)))
    np.testing.assert_array_equal(
        np.asarray(cyclic_unshift(x, 4)),
        np.asarray(cyclic_unshift_packed(x, 4, p)))
