"""Profiling: frame timings and rasterizer statistics.

The reference tracks per-phase wall-clock timings (RasterTimings,
`/root/reference/src/rasterizer/types.rs:1499`; FrameTimings,
`/root/reference/src/game/runtime.rs:13`; EditorFrameTimings,
`/root/reference/src/editor/state.rs:13`) plus a `triangles_drawn` counter
(render.rs:2545).

A jitted XLA pipeline fuses the transform/cull/sort/draw phases into one
compiled program, so "ms per phase" is not observable the reference's way.
The TPU-native equivalents here are:

  * RasterStats — device-computed counters (triangles drawn, opaque vs
    transparent split, culling breakdown) from the same surface-build pass
    the renderer uses.  These match the reference's counts exactly.
  * Profiler / FrameTimings — host-side phase timers with the reference's
    accumulate semantics, for the unfused stages (scene compile, upload,
    host stepping loop, whole jitted calls via block_until_ready).
  * trace() — context manager around jax.profiler for XLA/TPU-level traces
    (the idiomatic replacement for intra-render phase timing).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import time
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import RasterSettings
from .types import (CameraArrays, FaceArrays, Fog, Lights, MeshArrays,
                    TextureAtlas)
from .ops.surface import build_surfaces


class RasterStats(NamedTuple):
    """Device counters for one render (all () i32).

    triangles_drawn matches render.rs:2545 (surfaces surviving the cull
    phase, both passes).
    """

    triangles_in: jnp.ndarray        # valid input faces
    triangles_drawn: jnp.ndarray     # after near/fog/backface culling
    opaque_drawn: jnp.ndarray        # pass-1 surfaces
    transparent_drawn: jnp.ndarray   # pass-2 surfaces
    backfaces_culled: jnp.ndarray    # valid faces rejected as backfacing


@functools.partial(jax.jit, static_argnames=("settings", "width", "height"))
def raster_stats(mesh: MeshArrays, faces: FaceArrays, atlas: TextureAtlas,
                 camera: CameraArrays, lights: Lights, fog: Fog,
                 settings: RasterSettings, width: int,
                 height: int) -> RasterStats:
    """Counters from the same cull pass the renderer runs."""
    s = build_surfaces(mesh, faces, atlas, camera, lights, fog, settings,
                      width, height)
    drawn = s.valid
    transparent = drawn & s.has_transparency
    i32 = lambda m: jnp.sum(m).astype(jnp.int32)  # noqa: E731
    return RasterStats(
        triangles_in=i32(faces.valid),
        triangles_drawn=i32(drawn),
        opaque_drawn=i32(drawn & ~s.has_transparency),
        transparent_drawn=i32(transparent),
        backfaces_culled=i32(faces.valid & ~drawn),
    )


@dataclasses.dataclass
class FrameTimings:
    """Host-side per-phase accumulator (types.rs:1516 accumulate())."""

    ms: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    def add(self, phase: str, seconds: float) -> None:
        self.ms[phase] = self.ms.get(phase, 0.0) + seconds * 1e3
        self.counts[phase] = self.counts.get(phase, 0) + 1

    def accumulate(self, other: "FrameTimings") -> None:
        for k, v in other.ms.items():
            self.ms[k] = self.ms.get(k, 0.0) + v
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v

    @property
    def total_ms(self) -> float:
        return sum(self.ms.values())

    def summary(self) -> str:
        lines = []
        for k in sorted(self.ms, key=self.ms.get, reverse=True):
            n = self.counts.get(k, 1)
            lines.append(f"{k:24s} {self.ms[k]:10.3f} ms"
                         f"  ({self.ms[k] / max(n, 1):8.3f} ms/call x{n})")
        lines.append(f"{'total':24s} {self.total_ms:10.3f} ms")
        return "\n".join(lines)


class Profiler:
    """Phase timer.  `with prof.phase("raster"): ...` accumulates wall time;
    device work is fenced with block_until_ready so a phase's time includes
    its dispatched computation (without it, async dispatch would charge the
    time to whoever synchronizes next)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.timings = FrameTimings()

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.timings.add(name, time.perf_counter() - t0)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its output, charge the wall time to `name`."""
        if not self.enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.timings.add(name, time.perf_counter() - t0)
        return out

    def reset(self) -> FrameTimings:
        out = self.timings
        self.timings = FrameTimings()
        return out

    def summary(self) -> str:
        return self.timings.summary()


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level profiling (jax.profiler) — the TPU-native replacement for
    the reference's intra-render phase timers.  View with TensorBoard or
    xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
