"""Data pipeline, checkpointing, and end-to-end trainer smoke tests."""

import os

import numpy as np
import pytest

from uformer_tpu.data.datasets import (
    PairedTrainDataset,
    PairedValDataset,
    InputOnlyDataset,
    batch_iterator,
    get_training_data,
    prefetch_to_device,
)


def _write_png(path, arr):
    import cv2

    cv2.imwrite(str(path), cv2.cvtColor(
        np.uint8(np.clip(arr, 0, 1) * 255), cv2.COLOR_RGB2BGR))


@pytest.fixture
def paired_dir(tmp_path):
    rng = np.random.default_rng(0)
    gt_dir = tmp_path / "groundtruth"
    in_dir = tmp_path / "input"
    gt_dir.mkdir()
    in_dir.mkdir()
    for i in range(6):
        gt = rng.uniform(0, 1, (48, 64, 3))
        _write_png(gt_dir / f"{i}.png", gt)
        _write_png(in_dir / f"{i}.png", np.clip(gt + 0.05, 0, 1))
    return tmp_path


def test_train_dataset_crop_and_pairing(paired_dir):
    ds = PairedTrainDataset(str(paired_dir), patch_size=32)
    assert len(ds) == 6
    gt, noisy = ds[0]
    assert gt.shape == (32, 32, 3) and noisy.shape == (32, 32, 3)
    # pairing preserved through crop+aug: input = gt + 0.05 (clipped),
    # so the difference is nearly constant
    d = noisy - gt
    assert d.mean() > 0.02 and d.std() < 0.03


def test_train_dataset_decode_cache(paired_dir):
    # cached epochs must produce byte-identical batches to uncached ones
    ds_c = PairedTrainDataset(str(paired_dir), patch_size=32, cache_mb=64)
    ds_n = PairedTrainDataset(str(paired_dir), patch_size=32, cache_mb=0)
    assert ds_c._cache is not None and ds_n._cache is None
    for _ in batch_iterator(ds_c, 4, seed=0):  # warm the LRU
        pass
    assert ds_c._cache_bytes > 0
    for bc, bn in zip(batch_iterator(ds_c, 4, seed=3),
                      batch_iterator(ds_n, 4, seed=3)):
        assert all(np.array_equal(a, b) for a, b in zip(bc, bn))
    # the budget is a hard cap: a tiny budget evicts instead of growing
    ds_t = PairedTrainDataset(str(paired_dir), patch_size=32, cache_mb=1)
    for _ in batch_iterator(ds_t, 4, seed=0):
        pass
    assert ds_t._cache_bytes <= ds_t._cache_budget


def test_val_dataset_center_crop(paired_dir):
    ds = PairedValDataset(str(paired_dir), center_crop=32)
    gt, noisy, name = ds[0]
    assert gt.shape == (32, 32, 3)
    assert name == "0"


def test_input_only_dataset(paired_dir):
    ds = InputOnlyDataset(str(paired_dir / "input"))
    img, name = ds[0]
    assert img.shape == (48, 64, 3)


def test_batch_iterator_and_prefetch(paired_dir):
    ds = get_training_data(str(paired_dir), {"patch_size": 32})
    batches = list(batch_iterator(ds, 2, seed=1))
    assert len(batches) == 3
    assert batches[0]["input"].shape == (2, 32, 32, 3)
    dev_batches = list(prefetch_to_device(iter(batches)))
    assert len(dev_batches) == 3


def test_patch_generator(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    scene = tmp_path / "src" / "0001_scene"
    scene.mkdir(parents=True)
    for n in ("0001_GT_SRGB_010.PNG", "0001_NOISY_SRGB_010.PNG"):
        cv2.imwrite(str(scene / n),
                    np.uint8(rng.uniform(0, 255, (80, 80, 3))))
    from uformer_tpu.data.patches import generate_patches_sidd

    n = generate_patches_sidd(str(tmp_path / "src"), str(tmp_path / "tar"),
                              ps=32, num_patches=5, num_cores=2)
    assert n == 5
    import glob

    assert len(glob.glob(str(tmp_path / "tar" / "groundtruth" / "*.png"))) == 5
    assert len(glob.glob(str(tmp_path / "tar" / "input" / "*.png"))) == 5


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from uformer_tpu.train.checkpoints import (
        load_checkpoint, load_params, load_start_epoch, save_checkpoint)

    params = {"params": {"layer": {"kernel": np.ones((3, 4), np.float32),
                                   "bias": np.zeros(4, np.float32)}}}
    save_checkpoint(str(tmp_path), "model_best", 7, params)
    ckpt = load_checkpoint(str(tmp_path / "model_best"))
    assert int(ckpt["epoch"]) == 7
    np.testing.assert_array_equal(
        ckpt["params"]["params"]["layer"]["kernel"], np.ones((3, 4)))
    assert load_start_epoch(str(tmp_path / "model_best")) == 7
    p = load_params(str(tmp_path / "model_best"))
    assert p["params"]["layer"]["bias"].shape == (4,)


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, paired_dir):
    """Two epochs of real training through the Trainer on the CPU mesh:
    loss logged, best/latest checkpoints written, resume works."""
    from uformer_tpu.config import Options
    from uformer_tpu.train.trainer import Trainer

    opt = Options(arch="Uformer", embed_dim=8, win_size=2, train_ps=32,
                  batch_size=2, nepoch=2, workers=2, warmup=True,
                  warmup_epochs=1, save_dir=str(tmp_path / "logs"),
                  train_dir=str(paired_dir), val_dir=str(paired_dir),
                  dtype="float32", attn_backend="jnp",
                  pretrain_weights="", checkpoint=2)
    # win_size plumb-through for the tiny geometry
    tr = Trainer(opt)
    ds = PairedTrainDataset(str(paired_dir), patch_size=32)
    vs = PairedValDataset(str(paired_dir), center_crop=32)
    state, best = tr.fit(train_dataset=ds, val_dataset=vs)
    assert best > 10  # identity-ish restoration of +0.05 noise
    assert os.path.isdir(os.path.join(tr.model_dir, "model_best"))
    assert os.path.isdir(os.path.join(tr.model_dir, "model_latest"))
    assert os.path.isdir(os.path.join(tr.model_dir, "model_epoch_2"))

    # resume from latest
    opt2 = Options(**{**opt.__dict__, "resume": True, "nepoch": 3})
    tr2 = Trainer(opt2)
    state2, _ = tr2.fit(train_dataset=ds, val_dataset=vs)
    assert int(state2.step) > int(state.step) - 100  # continued


@pytest.mark.slow
def test_resume_restores_step_mixup_and_lr(tmp_path, paired_dir):
    """Resume must restore TrainState.step so the mixup gate (epoch>5,
    reference train_denoise.py:178-179) stays enabled and the logged LR
    matches the schedule at the true position."""
    import jax
    import jax.numpy as jnp
    from uformer_tpu.config import Options
    from uformer_tpu.train.checkpoints import save_checkpoint
    from uformer_tpu.train.train_step import make_train_step
    from uformer_tpu.train.trainer import Trainer

    opt = Options(arch="Uformer", embed_dim=8, win_size=2, train_ps=32,
                  batch_size=2, nepoch=10, workers=0, warmup=True,
                  warmup_epochs=1, mode="denoising",
                  save_dir=str(tmp_path / "logs"), dtype="float32",
                  attn_backend="jnp", pretrain_weights="")
    tr = Trainer(opt)
    spe = 4
    tr.build(steps_per_epoch=spe)
    state = tr.init_state(resume=False)
    step_saved = 6 * spe  # end of epoch 6 — past the mixup gate
    save_checkpoint(tr.model_dir, "model_latest", 6, state.params,
                    state.opt_state, step=step_saved)

    state2 = tr.init_state(resume=True)
    assert int(state2.step) == step_saved
    assert tr.start_epoch == 7
    # logged LR uses sched(step-1): must be the true schedule position,
    # not the reset-to-0 value
    assert float(tr.sched(int(state2.step) - 1)) == float(
        tr.sched(step_saved - 1))
    assert float(tr.sched(step_saved - 1)) != float(tr.sched(-1))

    # mixup gate: at the restored step, epoch=7>5 so the mixup branch of
    # the train step must actually fire (loss differs from a no-mixup step
    # with the same rng)
    rng = np.random.default_rng(1)
    batch = {
        "input": jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32),
    }
    step_mix = make_train_step(tr.model, mixup_after_epoch=5,
                               steps_per_epoch=spe)
    step_plain = make_train_step(tr.model, mixup_after_epoch=None,
                                 steps_per_epoch=spe)
    key = jax.random.PRNGKey(0)
    _, loss_mix = step_mix(state2, batch, key)
    _, loss_plain = step_plain(state2, batch, key)
    assert abs(float(loss_mix) - float(loss_plain)) > 1e-6


@pytest.mark.slow
def test_validate_pads_arbitrary_image_sizes(tmp_path, paired_dir):
    """Trainer.validate must accept val images that are not a multiple of
    win_size*16 (pads then unpads, like the reference test scripts)."""
    import jax.numpy as jnp
    from uformer_tpu.config import Options
    from uformer_tpu.train.trainer import Trainer

    opt = Options(arch="Uformer", embed_dim=8, win_size=2, train_ps=32,
                  batch_size=2, nepoch=1, workers=0,
                  save_dir=str(tmp_path / "logs"), dtype="float32",
                  attn_backend="jnp", pretrain_weights="")
    tr = Trainer(opt)
    tr.build(steps_per_epoch=1)
    state = tr.init_state(resume=False)
    rng = np.random.default_rng(2)
    # 40x56 is not a multiple of win_size*16 = 32
    gt = rng.uniform(0, 1, (1, 40, 56, 3)).astype(np.float32)
    batches = [{"input": jnp.asarray(np.clip(gt + 0.05, 0, 1)),
                "target": jnp.asarray(gt)}]
    psnr = tr.validate(state, batches)
    assert np.isfinite(psnr) and psnr > 0
