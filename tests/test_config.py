"""Config / CLI bridge tests (reference options.py parity)."""

import argparse

from uformer_tpu.config import Options, add_options_to_parser, options_from_args


def _parse(argv):
    p = argparse.ArgumentParser()
    add_options_to_parser(p)
    return options_from_args(p.parse_args(argv))


def test_defaults_roundtrip():
    opt = _parse([])
    assert opt == Options()


def test_warmup_default_matches_reference():
    # reference options.py:56: default False; recipes enable it explicitly
    assert Options().warmup is False
    assert _parse(["--warmup"]).warmup is True


def test_bool_flags_settable_both_ways():
    # every bool flag must be disable-able from the CLI (StepLR branch is
    # reached by NOT passing --warmup; --no-X overrides a True default)
    assert _parse(["--warmup", "--no-warmup"]).warmup is False
    assert _parse(["--resume"]).resume is True
    assert _parse(["--no-resume"]).resume is False
    assert _parse(["--save_images", "--no-save_images"]).save_images is False


def test_typed_flags():
    opt = _parse(["--batch_size", "8", "--lr_initial", "3e-4",
                  "--arch", "Uformer_T", "--mesh_data", "4"])
    assert opt.batch_size == 8
    assert opt.lr_initial == 3e-4
    assert opt.arch == "Uformer_T"
    assert opt.mesh_data == 4


def test_reference_recipe_lines_parse():
    # the canonical recipe flag lines (reference script/train_denoise.sh,
    # train_motiondeblur.sh) must parse unchanged
    opt = _parse(["--arch", "Uformer_B", "--batch_size", "32", "--gpu", "",
                  "--train_ps", "128", "--env", "32_0705_1",
                  "--embed_dim", "32", "--warmup", "--mode", "denoising"])
    assert opt.warmup and opt.train_ps == 128 and opt.mode == "denoising"
    opt = _parse("--arch Uformer_B --batch_size 8 --train_ps 256"
                 " --nepoch 3000 --checkpoint 500 --dataset GoPro --warmup"
                 " --mode deblurring".split())
    assert opt.nepoch == 3000 and opt.checkpoint == 500
