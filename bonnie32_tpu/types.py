"""Core array-of-structs pytree types for the TPU render pipeline.

The reference passes `&[Vertex]`, `&[Face]`, `&[Texture15]`, `&Camera`,
settings and fog into `render_mesh_15` (`/root/reference/src/rasterizer/
render.rs:2302`).  Here the same data lives in padded, fixed-shape device
arrays so it can batch over a leading instance axis and shard over a mesh.

All NamedTuples are JAX pytrees; `valid` masks carry the dynamic counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MeshArrays(NamedTuple):
    """Vertex buffers. Reference: Vertex (types.rs:947-959)."""

    pos: jnp.ndarray      # (V, 3) f32 world position
    uv: jnp.ndarray       # (V, 2) f32
    normal: jnp.ndarray   # (V, 3) f32
    color: jnp.ndarray    # (V, 3) i32 vertex color rgb 0-255 (NEUTRAL=128)
    color_blend: jnp.ndarray  # (V,) i32 BlendMode of the vertex color


class FaceArrays(NamedTuple):
    """Triangle faces. Reference: Face (types.rs:983-1002)."""

    vidx: jnp.ndarray              # (T, 3) i32 vertex indices
    tex_id: jnp.ndarray            # (T,) i32 texture index, -1 = untextured
    black_transparent: jnp.ndarray  # (T,) bool
    blend_mode: jnp.ndarray        # (T,) i32 BlendMode
    editor_alpha: jnp.ndarray      # (T,) i32 0-255
    double_sided: jnp.ndarray      # (T,) bool — per-face backface-cull opt-out
                                   # (MeshPart.double_sided, scene.rs:134-138)
    valid: jnp.ndarray             # (T,) bool padding mask
    key_possible: jnp.ndarray      # (T,) bool — False only when scene compile
                                   # PROVED the face's UV footprint contains
                                   # no black texel (then color keying can
                                   # never fire; build.compute_key_possible).
                                   # Purely a fast-path hint; True is always
                                   # safe.


class TextureAtlas(NamedTuple):
    """All scene textures flattened into one device array.

    Reference: `&[Texture15]` (types.rs:532-539).  Entry semantics per
    texture: Color15 words row-major at `offset`, extent (height, width).
    """

    data: jnp.ndarray        # (A,) i32 Color15 words
    offset: jnp.ndarray      # (NT,) i32 start index into data
    width: jnp.ndarray       # (NT,) i32
    height: jnp.ndarray      # (NT,) i32
    blend_mode: jnp.ndarray  # (NT,) i32 texture-level BlendMode
    has_black: jnp.ndarray   # (NT,) bool any texel with rgb555 == 0
    has_transparent: jnp.ndarray  # (NT,) bool any texel word == 0x0000
    # Keying bit planes, 32 texels per word over the flat data layout:
    # bit f of word [f >> 5] says texel f keys out under black_transparent
    # (rgb == 0) / under transparent-only (word == 0) respectively.
    black_words: jnp.ndarray  # (ceil(A/32),) i32
    transp_words: jnp.ndarray  # (ceil(A/32),) i32
    # Per-texture black-bit word rows: row t holds texture t's keying bits
    # packed RELATIVE to its own first texel (bit f of word [f >> 5]).
    # Lets the keyed pass fetch one small row per face instead of one-hot
    # gathering over the whole atlas's word plane.
    black_wrows: jnp.ndarray  # (NT, Wmax) i32


class TextureAtlas8(NamedTuple):
    """8-bit textures for the non-RGB555 path (`&[Texture]`,
    types.rs:1236).  Texel word: r | g<<8 | b<<16 | blend<<24, where blend
    is the per-texel BlendMode (ERASE = transparent texel, types.rs:1095).
    """

    data: jnp.ndarray        # (A,) i32 packed texels
    offset: jnp.ndarray      # (NT,) i32
    width: jnp.ndarray       # (NT,) i32
    height: jnp.ndarray      # (NT,) i32
    blend_mode: jnp.ndarray  # (NT,) i32 texture-level BlendMode


class Lights(NamedTuple):
    """Scene lights. Reference: Light/LightType (types.rs:1296-1369).

    kind: 0 = disabled, 1 = directional, 2 = point, 3 = spot.
    `color01` is the light color pre-divided by 255 on the host (f32,
    correctly rounded) matching `light.color.r as f32 / 255.0`
    (render.rs:1062-1064).
    """

    kind: jnp.ndarray       # (L,) i32
    position: jnp.ndarray   # (L, 3) f32 (point/spot)
    direction: jnp.ndarray  # (L, 3) f32 (directional/spot), pre-normalized
    color01: jnp.ndarray    # (L, 3) f32
    intensity: jnp.ndarray  # (L,) f32
    radius: jnp.ndarray     # (L,) f32
    angle: jnp.ndarray      # (L,) f32 (spot cone angle, radians)
    ambient: jnp.ndarray    # () f32 — dynamic so per-room ambient (Room.ambient,
                            # world/geometry.rs:2456) reuses one compiled program


class CameraArrays(NamedTuple):
    """Camera pose. Reference: Camera (camera.rs:9-18)."""

    position: jnp.ndarray  # (3,) f32
    basis: jnp.ndarray     # (3, 3) f32, rows = (basis_x, basis_y, basis_z)


class Fog(NamedTuple):
    """Per-room fog. Reference: render_mesh_15's `fog` tuple (render.rs:2309).

    `enabled` is a traced bool so rooms with/without fog share one program.
    """

    enabled: jnp.ndarray   # () bool
    start: jnp.ndarray     # () f32
    falloff: jnp.ndarray   # () f32
    cull_distance: jnp.ndarray  # () f32
    color: jnp.ndarray     # (3,) i32 rgb 0-255


class Surfaces(NamedTuple):
    """Projected, culled, fogged triangles ready for rasterization.

    Reference: Surface (render.rs:975-1000) as padded arrays.  Corner order
    already has the backface winding swap applied (render.rs:2452-2479).
    """

    sx: jnp.ndarray            # (T, 3) f32 screen x per corner
    sy: jnp.ndarray            # (T, 3) f32 screen y per corner
    z: jnp.ndarray             # (T, 3) f32 depth (perspective denominator)
    inv_z: jnp.ndarray         # (T, 3) f32 exact 1/z per corner
    area: jnp.ndarray          # (T,) f32 doubled signed area (raster formula)
    inv_area: jnp.ndarray      # (T,) f32 exact 1/area (degenerate-guarded)
    uv: jnp.ndarray            # (T, 3, 2) f32
    vc: jnp.ndarray            # (T, 3, 3) i32 fogged vertex colors 0-255
    shade: jnp.ndarray         # (T, 3, 3) f32 per-corner RGB light shade
    tex_id: jnp.ndarray        # (T,) i32 (-1 = none)
    blend_mode: jnp.ndarray    # (T,) i32 resolved blend (texture's else face's)
    black_transparent: jnp.ndarray  # (T,) bool
    editor_alpha: jnp.ndarray  # (T,) i32
    needs_dither: jnp.ndarray  # (T,) bool (render.rs:1487-1492 rule)
    has_transparency: jnp.ndarray  # (T,) bool -> transparent pass
    centroid_z: jnp.ndarray    # (T,) f32 painter's/transparency sort key
    valid: jnp.ndarray         # (T,) bool
    key_possible: jnp.ndarray  # (T,) bool — see FaceArrays.key_possible


class FrameBuffers(NamedTuple):
    """Batched framebuffer state. Reference: Framebuffer (render.rs:10-15).

    color: packed RGBA8 words (r | g<<8 | b<<16 | a<<24).
    depth: either harmonic z (parity path, init +MAX, test `<`) or inverse z
    (fast path, init 0, test `>`), see ops/raster_ref.py.
    """

    color: jnp.ndarray  # (H, W) i32
    depth: jnp.ndarray  # (H, W) f32


def empty_lights(n: int = 0, pad: int = 8) -> Lights:
    """All-disabled light array of capacity `pad`."""
    del n
    return Lights(
        kind=jnp.zeros((pad,), jnp.int32),
        position=jnp.zeros((pad, 3), jnp.float32),
        direction=jnp.zeros((pad, 3), jnp.float32),
        color01=jnp.zeros((pad, 3), jnp.float32),
        intensity=jnp.zeros((pad,), jnp.float32),
        radius=jnp.zeros((pad,), jnp.float32),
        angle=jnp.zeros((pad,), jnp.float32),
        ambient=jnp.float32(0.3),
    )


def default_lights(pad: int = 8) -> Lights:
    """RasterSettings::default's single directional light (types.rs:1483):
    direction (-1,-1,-1) normalized, white, intensity 0.7."""
    d = np.array([-1.0, -1.0, -1.0], np.float32)
    n = d / np.sqrt(np.float32(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]))
    lights = empty_lights(pad=pad)
    return lights._replace(
        kind=lights.kind.at[0].set(1),
        direction=lights.direction.at[0].set(jnp.asarray(n)),
        color01=lights.color01.at[0].set(jnp.asarray(np.array([1.0, 1.0, 1.0], np.float32))),
        intensity=lights.intensity.at[0].set(jnp.float32(0.7)),
    )


def no_fog() -> Fog:
    return Fog(
        enabled=jnp.asarray(False),
        start=jnp.float32(0.0),
        falloff=jnp.float32(0.0),
        cull_distance=jnp.float32(3.4e38),
        color=jnp.zeros((3,), jnp.int32),
    )
