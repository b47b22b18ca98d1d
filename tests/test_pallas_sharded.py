"""Fused Pallas kernels composed with shard_map (VERDICT round 2, item 6).

A real multi-chip TPU run executes the fused kernels INSIDE a shard_map
body (data-parallel batch sharding); these tests exercise exactly that
composition on the virtual CPU mesh (kernels in interpret mode), so the
tracing/partitioning path is covered in CI, not just single-device calls.
On a real TPU the same code runs the compiled kernels (see
scripts/kernel_bench.py --sharded).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uformer_tpu.ops.pallas.leff import fused_leff, leff_reference
from uformer_tpu.ops.pallas.attention_image import (
    attention_image_reference,
    fused_attention_image,
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def test_fused_leff_inside_shard_map_batch_sharded():
    rng = np.random.default_rng(0)
    B, H, W, C, Ch = 4, 16, 16, 32, 128
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.2  # noqa
    x = mk(B, H, W, C)
    ws = dict(w1=mk(C, Ch), b1=mk(Ch), wd=mk(3, 3, Ch), bd=mk(Ch),
              w2=mk(Ch, C), b2=mk(C), ln_s=1.0 + 0.1 * mk(C),
              ln_b=0.1 * mk(C))

    mesh = _mesh(2)

    def body(x, w1, b1, wd, bd, w2, b2, ln_s, ln_b):
        return fused_leff(x, w1, b1, wd, bd, w2, b2, ln_s=ln_s, ln_b=ln_b,
                          residual=True, interpret=True)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"),) + (P(),) * 8,
        out_specs=P("data"), check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(fn(xs, *ws.values()))
    want = np.asarray(x + leff_reference(x, **ws))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_fused_attention_image_inside_shard_map_batch_sharded():
    rng = np.random.default_rng(1)
    B, H, W, C, nH = 4, 16, 16, 128, 4
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.2  # noqa
    inp = dict(
        x=mk(B, H, W, C), mod=mk(64, C), ln_s=1.0 + 0.1 * mk(C),
        ln_b=0.1 * mk(C), wq=mk(C, C), bq=mk(C), wkv=mk(C, 2 * C),
        bkv=mk(2 * C), wo=mk(C, C), bo=mk(C), bias=mk(nH, 64, 64))
    kw = dict(win=8, shift=4, scale=0.17, num_heads=nH, residual=True)

    mesh = _mesh(4)
    body = functools.partial(fused_attention_image, interpret=True, **kw)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"),) + (P(),) * 10,
        out_specs=P("data"), check_vma=False)
    xs = jax.device_put(inp["x"], NamedSharding(mesh, P("data")))
    got = np.asarray(fn(xs, *list(inp.values())[1:]))
    want = np.asarray(attention_image_reference(**inp, **kw))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_stage_inside_shard_map_batch_sharded():
    """The whole-stage megakernel under shard_map: per-shard batch slice
    through n=2 blocks (attn + LeFF, alternating shift)."""
    from uformer_tpu.ops.pallas.stage import fused_stage, stage_reference

    rng = np.random.default_rng(2)
    B, H, W, C, Ch, n, nH = 2, 16, 16, 128, 512, 2, 4
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.2  # noqa
    p = dict(
        ln1_s=1.0 + 0.1 * mk(n, C), ln1_b=0.1 * mk(n, C),
        wq=mk(n, C, C), bq=mk(n, C), wk=mk(n, C, C), bk=mk(n, C),
        wv=mk(n, C, C), bv=mk(n, C), wo=mk(n, C, C), bo=mk(n, C),
        bias=mk(n, nH, 64, 64), mod=mk(n, 64, C),
        ln2_s=1.0 + 0.1 * mk(n, C), ln2_b=0.1 * mk(n, C),
        w1=mk(n, C, Ch), b1=mk(n, Ch), wd=mk(n, 3, 3, Ch), bd=mk(n, Ch),
        w2=mk(n, Ch, C), b2=mk(n, C))
    kw = dict(scale=0.17, num_heads=nH, use_shift=True, has_mod=True)
    x = mk(B, H, W, C)

    mesh = _mesh(2)

    def body(x, p):
        return fused_stage(x, p, interpret=True, **kw)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"), check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(fn(xs, p))
    want = np.asarray(stage_reference(x, p, **kw))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
