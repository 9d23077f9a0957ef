"""bonnie32_tpu — a TPU-native batched PS1-era fantasy-console framework.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of
EBonura/bonnie-32 (a Rust software rasterizer + world editor + game runtime +
music tracker).  Instead of rendering one frame on one CPU, every operation
carries a leading *instance* axis so thousands of independent 320x240 game
instances step and rasterize per TPU program, sharded over a device mesh for
multi-chip scale-out.

Layout (mirrors SURVEY.md section 2 of the repo):
  ops/       TPU compute path: fixed-point GTE lattice math, RGB555 color ops,
             vertex pipeline, rasterizers (sequential parity path, visibility
             fast path, Pallas kernels), lighting, depth sort.
  models/    data model: levels/rooms/sectors, meshes/atlases/CLUTs, assets,
             user textures, songs; scene compilation to padded device arrays.
  game/      batched game runtime: SoA ECS, cylinder collision, character
             controller, fused step+render.
  parallel/  jax.sharding device-mesh utilities (pure DP over instances).
  io/        RON + brotli serialization compatible with the reference formats.
  audio/     PS1 SPU reverb + Gaussian resampler DSP.
  utils/     profiling counters, config.

NOTE: x64 is enabled at import time.  The PS1 GTE emulation (ops/fixed.py)
needs true int64/uint64 arithmetic, and bit-exact float32 parity with the
reference renderer needs float64-backed correctly-rounded division/sqrt
(ops/exactf.py).  All public APIs use explicit 32-bit dtypes; nothing in this
package relies on x64 default promotion.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .config import RasterSettings, ShadingMode, BlendMode  # noqa: E402,F401
