"""uformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-restoration framework.

Re-implements, TPU-first, the full capability surface of the reference
Uformer codebase (ZhendongWang6/Uformer, CVPR 2022): the LeWin
window-attention U-Net family, its data pipelines, training loops,
evaluation harnesses, and checkpoint formats.

Design stance (vs the torch reference):
  * NHWC `(B, H, W, C)` activations everywhere — no `(B, L, C)` token
    flattening with `sqrt(L)` round-trips (reference `model.py:910`),
    which removes the square-input restriction at the core level.
  * Pure-functional modules (flax.linen) with explicit RNG threading.
  * One jitted train step; bf16 compute policy instead of AMP/GradScaler.
  * `jax.sharding.Mesh` + NamedSharding for data/model parallelism
    instead of `torch.nn.DataParallel`.
  * Pallas TPU kernels for the hot paths (fused window attention,
    depthwise conv) with jnp fallbacks for CPU tests.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out: UFORMER_TPU_NO_CACHE=1).

    The flagship model compiles ~40 s cold on TPU; the cache makes every
    later process start warm. Set before any jit trace so the first
    compile of the process already populates it.
    """
    if _os.environ.get("UFORMER_TPU_NO_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "uformer_tpu_xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block import
        pass


_enable_compilation_cache()

from uformer_tpu.models.registry import get_arch, ARCHS  # noqa: F401
