#!/usr/bin/env python3
"""On-TPU gradient check for the hybrid image-attention AD (Pallas image
forward + windowed-Pallas backward behind XLA re-windowing glue): compares
every gradient against the jnp reference VJP in fp32. CPU tests can't
exercise this path (the hybrid bwd is TPU-only)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# the jnp reference must use true f32 matmuls — the TPU default is a
# single bf16 pass (~1e-2 error), which would drown the comparison
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    from uformer_tpu.ops.pallas.attention_image import (
        attention_image_reference,
        fused_attention_image_ad,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    ok = True
    for (B, H, W, C, nH, shift, residual) in [
        (2, 16, 16, 128, 4, 0, True),
        (2, 16, 24, 128, 4, 4, True),
        (2, 16, 16, 256, 8, 4, False),
        # narrow-C (packed bwd with folded LN — the training route of
        # enc0/enc1/dec3 at the reference recipe)
        (2, 16, 16, 32, 1, 0, True),
        (2, 16, 16, 32, 1, 4, False),
        (2, 16, 24, 64, 2, 4, True),
    ]:
        D = C // nH
        scale = D ** -0.5
        args = dict(
            x=rng.standard_normal((B, H, W, C)) * 0.5,
            mod=rng.standard_normal((64, C)) * 0.1,
            ln_s=1.0 + 0.1 * rng.standard_normal((C,)),
            ln_b=0.1 * rng.standard_normal((C,)),
            wq=rng.standard_normal((C, C)) * 0.05,
            bq=rng.standard_normal((C,)) * 0.02,
            wkv=rng.standard_normal((C, 2 * C)) * 0.05,
            bkv=rng.standard_normal((2 * C,)) * 0.02,
            wo=rng.standard_normal((C, C)) * 0.05,
            bo=rng.standard_normal((C,)) * 0.02,
            bias=rng.standard_normal((nH, 64, 64)) * 0.05,
        )
        a32 = {k: jnp.asarray(v, jnp.float32) for k, v in args.items()}
        kw = dict(win=8, shift=shift, scale=scale, num_heads=nH,
                  has_ln=True, residual=residual)
        names = list(a32)

        def loss_f(fn):
            def go(*vals):
                y = fn(*vals)
                t = jnp.sin(jnp.arange(y.size, dtype=jnp.float32) * 0.01
                            ).reshape(y.shape)
                return jnp.sum(y.astype(jnp.float32) * t)
            return go

        g_ref = jax.grad(loss_f(
            lambda *v: attention_image_reference(*v, **kw)),
            argnums=tuple(range(len(names))))(*a32.values())
        g_fus = jax.grad(loss_f(
            lambda *v: fused_attention_image_ad(*v, **kw)),
            argnums=tuple(range(len(names))))(*a32.values())
        for n, gr, gf in zip(names, g_ref, g_fus):
            gr, gf = np.asarray(gr), np.asarray(gf)
            denom = max(np.abs(gr).max(), 1e-6)
            err = np.abs(gr - gf).max() / denom
            flag = "ok" if err < 2e-3 else "FAIL"
            if err >= 2e-3:
                ok = False
            print(f"B{B} H{H} W{W} C{C} s{shift} res={residual} "
                  f"d{n}: rel-err {err:.2e} {flag}")
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
