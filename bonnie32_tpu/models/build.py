"""Host-side builders: numpy scene data -> padded device arrays.

The reference feeds `render_mesh_15` with Rust slices (`/root/reference/src/
rasterizer/render.rs:2302-2310`); here host data is packed once into the
fixed-shape pytrees of bonnie32_tpu.types.  Padding uses validity masks so a
single compiled program serves any scene up to the configured capacities.
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import BlendMode
from ..types import (CameraArrays, FaceArrays, Lights, MeshArrays,
                     TextureAtlas, empty_lights)


def make_mesh_arrays(pos, uv=None, normal=None, color=None, color_blend=None,
                     pad_to: Optional[int] = None) -> MeshArrays:
    """Pack vertex data.  Defaults mirror Vertex::new (types.rs:962):
    uv (0,0), normal zero, color NEUTRAL (128,128,128) opaque."""
    pos = np.asarray(pos, np.float32)
    v = pos.shape[0]
    uv = np.zeros((v, 2), np.float32) if uv is None else np.asarray(uv, np.float32)
    normal = np.zeros((v, 3), np.float32) if normal is None else np.asarray(normal, np.float32)
    if color is None:
        color = np.full((v, 3), 128, np.int32)
    else:
        color = np.asarray(color, np.int32)
    if color_blend is None:
        color_blend = np.full((v,), int(BlendMode.OPAQUE), np.int32)
    else:
        color_blend = np.asarray(color_blend, np.int32)

    n = pad_to or v
    assert n >= v

    def pad(a, fill=0):
        if a.shape[0] == n:
            return a
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[:v] = a
        return out

    return MeshArrays(
        pos=jnp.asarray(pad(pos)),
        uv=jnp.asarray(pad(uv)),
        normal=jnp.asarray(pad(normal)),
        color=jnp.asarray(pad(color)),
        color_blend=jnp.asarray(pad(color_blend)),
    )


def compute_key_possible(uv, vidx, tex_id, black_transparent,
                         textures) -> np.ndarray:
    """Per-face color-key footprint analysis (host-side, scene compile).

    A face can only key pixels out (render.rs:1588-1607) when its sampled
    UV footprint contains a black (rgb==0) texel.  Interpolated UV stays in
    the convex hull of the corner UVs (barycentric weights >= -1e-4), so a
    wrapped corner-UV bbox with a 1-texel margin is a safe overapproximation
    of the sampled texel set.  Returns a (T,) bool: False = proven clean.
    Faces that can't key anyway (untextured / bt off / no black texel in
    the texture) also report False.
    """
    uv = np.asarray(uv, np.float32)
    vidx = np.asarray(vidx, np.int64).reshape(-1, 3)
    tex_id = np.asarray(tex_id, np.int64).reshape(-1)
    bt = np.asarray(black_transparent, bool).reshape(-1)
    black_masks = []
    for pixels, _blend in textures:
        p = np.asarray(pixels).astype(np.int64) & 0xFFFF
        black_masks.append((p & 0x7FFF) == 0)

    def texel_span(lo: float, hi: float, n: int):
        span = hi - lo
        # epsilon: barycentric under/overshoot (<= 3e-4 of the range) + f32
        eps = abs(span) * 2e-3 + 1e-4
        i0 = int(np.floor((lo - eps) * n)) - 1
        i1 = int(np.floor((hi + eps) * n)) + 1
        if i1 - i0 + 1 >= n:
            return np.arange(n)
        return np.arange(i0, i1 + 1) % n

    out = np.zeros(len(tex_id), bool)
    for i in range(len(tex_id)):
        tid = int(tex_id[i])
        if tid < 0 or tid >= len(black_masks) or not bt[i]:
            continue
        mask = black_masks[tid]
        if not mask.any():
            continue
        cu = uv[vidx[i], 0]
        cv = 1.0 - uv[vidx[i], 1]  # sampler flips v (pixel.py sample_and_key)
        h, w = mask.shape
        txs = texel_span(float(cu.min()), float(cu.max()), w)
        tys = texel_span(float(cv.min()), float(cv.max()), h)
        out[i] = bool(mask[np.ix_(tys, txs)].any())
    return out


def make_face_arrays(vidx, tex_id=None, black_transparent=None,
                     blend_mode=None, editor_alpha=None, double_sided=None,
                     key_possible=None,
                     pad_to: Optional[int] = None) -> FaceArrays:
    """Pack faces.  Defaults mirror Face::new (types.rs:1013-1023):
    untextured, black_transparent=True, OPAQUE, editor_alpha=255."""
    vidx = np.asarray(vidx, np.int32).reshape(-1, 3)
    t = vidx.shape[0]
    tex_id = np.full((t,), -1, np.int32) if tex_id is None else np.asarray(tex_id, np.int32)
    if black_transparent is None:
        black_transparent = np.ones((t,), bool)
    else:
        black_transparent = np.asarray(black_transparent, bool)
    if blend_mode is None:
        blend_mode = np.full((t,), int(BlendMode.OPAQUE), np.int32)
    else:
        blend_mode = np.asarray(blend_mode, np.int32)
    if editor_alpha is None:
        editor_alpha = np.full((t,), 255, np.int32)
    else:
        editor_alpha = np.asarray(editor_alpha, np.int32)
    if double_sided is None:
        double_sided = np.zeros((t,), bool)
    else:
        double_sided = np.asarray(double_sided, bool)
    if key_possible is None:
        key_possible = np.ones((t,), bool)  # unknown -> conservative
    else:
        key_possible = np.asarray(key_possible, bool)
    valid = np.ones((t,), bool)

    n = pad_to or t
    assert n >= t

    def pad(a, fill=0):
        if a.shape[0] == n:
            return a
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[:t] = a
        return out

    return FaceArrays(
        vidx=jnp.asarray(pad(vidx)),
        tex_id=jnp.asarray(pad(tex_id, -1)),
        black_transparent=jnp.asarray(pad(black_transparent, False)),
        blend_mode=jnp.asarray(pad(blend_mode)),
        editor_alpha=jnp.asarray(pad(editor_alpha, 255)),
        double_sided=jnp.asarray(pad(double_sided, False)),
        valid=jnp.asarray(pad(valid, False)),
        key_possible=jnp.asarray(pad(key_possible, False)),
    )


def build_atlas(textures: Sequence[Tuple[np.ndarray, int]],
                pad_data_to: Optional[int] = None,
                pad_count_to: Optional[int] = None,
                pad_words_to: Optional[int] = None) -> TextureAtlas:
    """Flatten Texture15s into one atlas.

    `textures`: sequence of (pixels (h, w) uint16/int Color15 words,
    blend_mode).  Always includes a 1x1 white placeholder at slot capacity
    end so empty scenes still have valid table entries.
    """
    if not textures:
        textures = [(np.full((1, 1), 0x7FFF, np.uint16), int(BlendMode.OPAQUE))]
    offsets, widths, heights, blends, chunks = [], [], [], [], []
    has_black, has_transparent = [], []
    off = 0
    for pixels, blend in textures:
        pixels = np.asarray(pixels).astype(np.int64) & 0xFFFF
        h, w = pixels.shape
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        blends.append(int(blend))
        has_black.append(bool(((pixels & 0x7FFF) == 0).any()))
        has_transparent.append(bool((pixels == 0).any()))
        chunks.append(pixels.astype(np.int32).reshape(-1))
        off += h * w
    if pad_count_to is not None:
        while len(offsets) < pad_count_to:
            offsets.append(0)
            widths.append(1)
            heights.append(1)
            blends.append(0)
            has_black.append(False)
            has_transparent.append(False)
    data = np.concatenate(chunks).astype(np.int32)
    if pad_data_to and pad_data_to > data.size:
        data = np.concatenate([data, np.zeros(pad_data_to - data.size, np.int32)])

    def pack_bits(mask):
        # word count padded to a multiple of 128 for the one-hot gather
        n_words = -(-((mask.size + 31) // 32) // 128) * 128
        padded = np.zeros(n_words * 32, bool)
        padded[:mask.size] = mask
        bits = padded.reshape(n_words, 32).astype(np.uint32)
        words = (bits << np.arange(32, dtype=np.uint32)[None, :]).sum(
            axis=1, dtype=np.uint32)
        return words.astype(np.int64).astype(np.int32)

    black_words = pack_bits((data & 0x7FFF) == 0)
    transp_words = pack_bits(data == 0)

    # Per-texture word rows, bits relative to each texture's first texel.
    def pack_row(mask, n_words):
        padded = np.zeros(n_words * 32, bool)
        padded[:mask.size] = mask
        bits = padded.reshape(n_words, 32).astype(np.uint32)
        w = (bits << np.arange(32, dtype=np.uint32)[None, :]).sum(
            axis=1, dtype=np.uint32)
        return w.astype(np.int64).astype(np.int32)

    w_max = max(-(-(wd * ht) // 32) for wd, ht in zip(widths, heights))
    w_max = max(-(-w_max // 8) * 8, 8)
    if pad_words_to is not None:
        assert pad_words_to >= w_max
        w_max = pad_words_to
    rows = np.zeros((len(offsets), w_max), np.int32)
    for i, (o, wd, ht) in enumerate(zip(offsets, widths, heights)):
        tex_black = (data[o:o + wd * ht] & 0x7FFF) == 0
        rows[i, :] = pack_row(tex_black, w_max)

    return TextureAtlas(
        data=jnp.asarray(data),
        offset=jnp.asarray(np.asarray(offsets, np.int32)),
        width=jnp.asarray(np.asarray(widths, np.int32)),
        height=jnp.asarray(np.asarray(heights, np.int32)),
        blend_mode=jnp.asarray(np.asarray(blends, np.int32)),
        has_black=jnp.asarray(np.asarray(has_black, bool)),
        has_transparent=jnp.asarray(np.asarray(has_transparent, bool)),
        black_words=jnp.asarray(black_words),
        transp_words=jnp.asarray(transp_words),
        black_wrows=jnp.asarray(rows),
    )


def encode_atlas_packed(atlas: TextureAtlas):
    """Per-texture packed texel planes for the texture-major kernel fetch.

    The batched kernel's texel gather loops over table rows (~0.5 us/row/
    instance, PLAN_PERF.md round-2); packing shrinks the row count per
    texture and lets the kernel skip whole textures absent from a screen
    chunk.  Three encodings, chosen per texture by distinct-color count
    (PS1 art is CLUT-authored, so most textures palette-compress):

      * pal16 (<=16 colors):  4-bit palette indices, 8 per i32 word
      * pal4  (<=256 colors): 8-bit palette indices, 4 per i32 word
      * pack2 (otherwise):    16-bit Color15 texels, 2 per i32 word

    Returns (texpack (Rp,128) i32, texpal (Pp,128) i32, enc) where enc is
    a static tuple per texture: ("pack2", row0, nrows) or
    (mode, row0, nrows, pal_row0, pal_rows).  Decoding a texel is exact
    integer unpacking, so the kernel output is bit-identical to the
    unpacked atlas fetch.
    """
    data = np.asarray(atlas.data)
    offs = np.asarray(atlas.offset)
    ws = np.asarray(atlas.width)
    hs = np.asarray(atlas.height)
    enc = []
    pack_chunks, pal_chunks = [], []
    wrow = prow = 0
    for i in range(offs.shape[0]):
        o, w, h = int(offs[i]), int(ws[i]), int(hs[i])
        tex = data[o:o + w * h].astype(np.int64) & 0xFFFF
        uniq = np.unique(tex)
        if uniq.size <= 16:
            per, bits, mode = 8, 4, "pal16"
        elif uniq.size <= 256:
            per, bits, mode = 4, 8, "pal4"
        else:
            per, bits, mode = 2, 16, "pack2"
        vals = tex if mode == "pack2" else np.searchsorted(uniq, tex)
        n = vals.size
        nw = max(-(-n // per), 1)
        padded = np.zeros(nw * per, np.int64)
        padded[:n] = vals
        words = (padded.reshape(nw, per)
                 << (np.arange(per, dtype=np.int64)[None, :] * bits)).sum(
                     axis=1) & 0xFFFFFFFF
        words = np.where(words >= 2**31, words - 2**32, words)
        nrows = -(-nw // 128)
        rows = np.zeros((nrows, 128), np.int32)
        rows.reshape(-1)[:nw] = words.astype(np.int32)
        pack_chunks.append(rows)
        if mode == "pack2":
            enc.append((mode, wrow, nrows))
        else:
            pal_rows = 1 if uniq.size <= 128 else 2
            pal = np.zeros((pal_rows, 128), np.int32)
            pal.reshape(-1)[:uniq.size] = uniq.astype(np.int32)
            pal_chunks.append(pal)
            enc.append((mode, wrow, nrows, prow, pal_rows))
            prow += pal_rows
        wrow += nrows
    texpack = (np.concatenate(pack_chunks, axis=0) if pack_chunks
               else np.zeros((1, 128), np.int32))
    texpal = (np.concatenate(pal_chunks, axis=0) if pal_chunks
              else np.zeros((1, 128), np.int32))
    return texpack, texpal, tuple(enc)


def build_atlas8(textures, pad_data_to=None, pad_count_to=None
                 ) -> "TextureAtlas8":
    """Pack 8-bit textures for the non-RGB555 path.

    `textures`: sequence of (rgba (h, w, 4) uint8, blend_mode).  Alpha-0
    texels carry BlendMode::ERASE (types.rs:1095); others OPAQUE.
    """
    from ..types import TextureAtlas8
    if not textures:
        textures = [(np.full((1, 1, 4), 255, np.uint8), int(BlendMode.OPAQUE))]
    offsets, widths, heights, blends, chunks = [], [], [], [], []
    off = 0
    for rgba, blend in textures:
        rgba = np.asarray(rgba, np.uint8)
        h, w = rgba.shape[:2]
        texel_blend = np.where(rgba[..., 3] == 0, int(BlendMode.ERASE),
                               int(BlendMode.OPAQUE)).astype(np.int64)
        word = (rgba[..., 0].astype(np.int64)
                | (rgba[..., 1].astype(np.int64) << 8)
                | (rgba[..., 2].astype(np.int64) << 16)
                | (texel_blend << 24))
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        blends.append(int(blend))
        chunks.append(word.reshape(-1).astype(np.int32))
        off += h * w
    data = np.concatenate(chunks)
    if pad_data_to is not None and data.size < pad_data_to:
        data = np.concatenate([data,
                               np.zeros(pad_data_to - data.size, np.int32)])
    if pad_count_to is not None and len(offsets) < pad_count_to:
        extra = pad_count_to - len(offsets)
        offsets += [0] * extra
        widths += [1] * extra
        heights += [1] * extra
        blends += [int(BlendMode.OPAQUE)] * extra
    return TextureAtlas8(
        data=jnp.asarray(data),
        offset=jnp.asarray(np.asarray(offsets, np.int32)),
        width=jnp.asarray(np.asarray(widths, np.int32)),
        height=jnp.asarray(np.asarray(heights, np.int32)),
        blend_mode=jnp.asarray(np.asarray(blends, np.int32)),
    )


def camera_basis(pitch: float, yaw: float) -> np.ndarray:
    """Camera::update_basis (camera.rs:76-91) in host f32.

    up = (0, -1, 0) (screen convention); returns rows (bx, by, bz).
    """
    rx = np.float32(pitch)
    ry = np.float32(yaw)
    bz = np.array([np.cos(rx) * np.sin(ry), -np.sin(rx),
                   np.cos(rx) * np.cos(ry)], np.float32)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    bx = np.cross(up, bz).astype(np.float32)
    l = np.sqrt(np.float32(bx[0] * bx[0] + bx[1] * bx[1] + bx[2] * bx[2]))
    if l != 0:
        bx = (bx / l).astype(np.float32)
    by = np.cross(bz, bx).astype(np.float32)
    return np.stack([bx, by, bz])


def make_camera(position, basis) -> CameraArrays:
    return CameraArrays(position=jnp.asarray(np.asarray(position, np.float32)),
                        basis=jnp.asarray(np.asarray(basis, np.float32)))


def lights_from_list(specs: List[dict], pad: int = 8,
                     ambient: float = 0.3) -> Lights:
    """Build a Lights pytree from dicts:
    {kind: 'directional'|'point'|'spot', direction, position, color(0-255),
     intensity, radius, angle, enabled}."""
    kind_map = {"directional": 1, "point": 2, "spot": 3}
    L = empty_lights(pad=pad)
    kind = np.zeros(pad, np.int32)
    position = np.zeros((pad, 3), np.float32)
    direction = np.zeros((pad, 3), np.float32)
    color01 = np.zeros((pad, 3), np.float32)
    intensity = np.zeros(pad, np.float32)
    radius = np.zeros(pad, np.float32)
    angle = np.zeros(pad, np.float32)
    for i, s in enumerate(specs):
        if not s.get("enabled", True):
            continue
        kind[i] = kind_map[s["kind"]]
        if "position" in s:
            position[i] = np.asarray(s["position"], np.float32)
        if "direction" in s:
            d = np.asarray(s["direction"], np.float32)
            ln = np.sqrt(np.float32(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]))
            direction[i] = (d / ln).astype(np.float32) if ln != 0 else d
        c = np.asarray(s.get("color", (255, 255, 255)), np.float32)
        color01[i] = (c / np.float32(255.0)).astype(np.float32)
        intensity[i] = np.float32(s.get("intensity", 1.0))
        radius[i] = np.float32(s.get("radius", 0.0))
        angle[i] = np.float32(s.get("angle", 0.0))
    return L._replace(kind=jnp.asarray(kind), position=jnp.asarray(position),
                      direction=jnp.asarray(direction), color01=jnp.asarray(color01),
                      intensity=jnp.asarray(intensity), radius=jnp.asarray(radius),
                      angle=jnp.asarray(angle), ambient=jnp.float32(ambient))
