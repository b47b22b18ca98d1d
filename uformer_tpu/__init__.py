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

from uformer_tpu.models.registry import get_arch, ARCHS  # noqa: F401
