"""Golden numpy model of render_mesh_15 / rasterize_triangle_15.

A faithful transcription of the reference renderer's RGB555 path
(`/root/reference/src/rasterizer/render.rs`): same op order, same float32
rounding (numpy on x86 is IEEE like the Rust build), same integer cast
semantics, *incremental* edge-function accumulation (via sequential cumsum,
which matches scalar accumulation bit-for-bit), z-space depth buffer.

Used only by tests as the parity oracle for the JAX/TPU rasterizers.
"""

import numpy as np

from . import fixed_golden as fxg

F32 = np.float32

PS1_DITHER_MATRIX = np.array(
    [[-4, 0, -3, 1],
     [2, -2, 3, -1],
     [-3, 1, -4, 0],
     [3, -1, 2, -2]], dtype=np.int32)

OPAQUE, AVERAGE, ADD, SUBTRACT, ADD_QUARTER, ERASE = range(6)
NONE, FLAT, GOURAUD = range(3)

NEAR_PLANE = F32(0.1)


# =============================================================================
# Scalar float helpers (exact reference op order)
# =============================================================================

def _dot(a, b):
    return F32(F32(F32(a[0] * b[0]) + F32(a[1] * b[1])) + F32(a[2] * b[2]))


def _sub3(a, b):
    return np.array([a[0] - b[0], a[1] - b[1], a[2] - b[2]], F32)


def _add3(a, b):
    return np.array([a[0] + b[0], a[1] + b[1], a[2] + b[2]], F32)


def _scale3(a, s):
    s = F32(s)
    return np.array([a[0] * s, a[1] * s, a[2] * s], F32)


def _normalize3(a):
    l = F32(np.sqrt(_dot(a, a)))
    if l == 0:
        return np.zeros(3, F32)
    return np.array([a[0] / l, a[1] / l, a[2] / l], F32)


def _cross3(a, b):
    return np.array([
        F32(a[1] * b[2]) - F32(a[2] * b[1]),
        F32(a[2] * b[0]) - F32(a[0] * b[2]),
        F32(a[0] * b[1]) - F32(a[1] * b[0])], F32)


def perspective_transform(v, bx, by, bz):
    return np.array([_dot(v, bx), _dot(v, by), _dot(v, bz)], F32)


def project(v, width, height):
    """math.rs:117."""
    ud = F32(5.0)
    us = F32(ud - F32(1.0))
    vs = F32(F32(min(width, height) / 2.0) * F32(0.75))
    denom = F32(v[2] + ud)
    if abs(denom) < 0.001:
        return np.array([width / 2.0, height / 2.0, v[2]], F32)
    x = F32(F32(F32(F32(v[0] * us) / denom) * vs) + F32(width / 2.0))
    y = F32(F32(F32(F32(v[1] * us) / denom) * vs) + F32(height / 2.0))
    return np.array([x, y, denom], F32)


def project_ortho(v, zoom, cx, cy, width, height):
    """math.rs:140."""
    x = F32(F32(F32(v[0] - F32(cx)) * F32(zoom)) + F32(width / 2.0))
    y = F32(F32(-F32(F32(v[1] - F32(cy)) * F32(zoom))) + F32(height / 2.0))
    return np.array([x, y, v[2]], F32)


# =============================================================================
# Lighting (render.rs:1013-1071)
# =============================================================================

def shade_multi_light_color(normal, world_pos, lights, ambient):
    tr = F32(ambient)
    tg = F32(ambient)
    tb = F32(ambient)
    for l in lights:
        if not l.get("enabled", True):
            continue
        kind = l["kind"]
        inten = F32(l.get("intensity", 1.0))
        if kind == "directional":
            d = np.asarray(l["direction"], F32)
            neg = _scale3(d, -1.0)
            ndl = max(F32(0.0), _dot(normal, neg))
            contribution = F32(ndl * inten)
        elif kind == "point":
            pos = np.asarray(l["position"], F32)
            radius = F32(l["radius"])
            to_light = _sub3(pos, world_pos)
            dist = F32(np.sqrt(_dot(to_light, to_light)))
            if dist > radius or dist < 0.001:
                contribution = F32(0.0)
            else:
                att = F32(F32(1.0) - F32(dist / radius))
                ndl = max(F32(0.0), _dot(normal, _normalize3(to_light)))
                contribution = F32(F32(F32(ndl * inten) * att) * att)
        else:  # spot
            pos = np.asarray(l["position"], F32)
            d = np.asarray(l["direction"], F32)
            radius = F32(l["radius"])
            angle = F32(l["angle"])
            to_light = _sub3(pos, world_pos)
            dist = F32(np.sqrt(_dot(to_light, to_light)))
            if dist > radius or dist < 0.001:
                contribution = F32(0.0)
            else:
                lds = _normalize3(to_light)
                neg = _scale3(lds, -1.0)
                spot_angle = F32(np.arccos(_dot(neg, d)))
                if spot_angle > angle:
                    contribution = F32(0.0)
                else:
                    att = F32(F32(1.0) - F32(dist / radius))
                    edge = F32(F32(1.0) - F32(spot_angle / angle))
                    ndl = max(F32(0.0), _dot(normal, lds))
                    contribution = F32(F32(F32(F32(ndl * inten) * att) * att) * edge)
        c = np.asarray(l.get("color", (255, 255, 255)), F32)
        tr = F32(tr + F32(contribution * F32(c[0] / F32(255.0))))
        tg = F32(tg + F32(contribution * F32(c[1] / F32(255.0))))
        tb = F32(tb + F32(contribution * F32(c[2] / F32(255.0))))
    return (min(tr, F32(1.0)), min(tg, F32(1.0)), min(tb, F32(1.0)))


# =============================================================================
# Fog (render.rs:2266-2293)
# =============================================================================

def calculate_fog_factor(z, start, falloff):
    if z <= start:
        return F32(0.0)
    if falloff <= 0.0:
        return F32(1.0)
    return min(F32(F32(z - start) / F32(falloff)), F32(1.0))


def apply_fog_to_color(rgb, blend, fog_rgb, f):
    if f <= 0.0:
        return rgb, blend
    if f >= 1.0:
        return tuple(fog_rgb), OPAQUE
    inv = F32(F32(1.0) - f)
    out = tuple(int(F32(F32(F32(c) * inv) + F32(F32(fc) * f))) for c, fc in zip(rgb, fog_rgb))
    return out, OPAQUE


# =============================================================================
# Triangle rasterization (render.rs:1440-1714), bbox-vectorized
# =============================================================================

def _seq_accum(start, step, n):
    """Sequential f32 accumulation start, start+step, ... (n values),
    matching scalar `w += step` loops bit-for-bit."""
    vals = np.empty(n, F32)
    if n == 0:
        return vals
    acc = np.concatenate([[start], np.full(n - 1, step, F32)])
    return np.add.accumulate(acc, dtype=F32)


def expand_5_to_8(v5):
    return ((v5 << 3) | (v5 >> 2))


def rasterize_triangle_15(fb, surf, texture, face_blend_mode,
                          black_transparent, settings, skip_z_write, lights):
    pixels = fb["pixels"]
    zbuffer = fb["zbuffer"]
    H, W = zbuffer.shape

    blend_mode = texture["blend_mode"] if texture is not None else face_blend_mode

    v1, v2, v3 = surf["v1"], surf["v2"], surf["v3"]

    min_x = int(max(min(v1[0], v2[0], v3[0]), F32(0.0)))
    max_xf = min(F32(max(v1[0], v2[0], v3[0]) + F32(1.0)), F32(W))
    max_x = int(max_xf) if max_xf > 0 else 0
    min_y = int(max(min(v1[1], v2[1], v3[1]), F32(0.0)))
    max_yf = min(F32(max(v1[1], v2[1], v3[1]) + F32(1.0)), F32(H))
    max_y = int(max_yf) if max_yf > 0 else 0
    if min_x >= max_x or min_y >= max_y:
        return

    shading = settings["shading"]
    if shading == FLAT:
        center = _scale3(_add3(_add3(surf["w1"], surf["w2"]), surf["w3"]), F32(1.0 / 3.0))
        wn = _normalize3(_scale3(_add3(_add3(surf["wn1"], surf["wn2"]), surf["wn3"]), F32(1.0 / 3.0)))
        flat_shade = shade_multi_light_color(wn, center, lights, settings["ambient"])
    else:
        flat_shade = (F32(1.0), F32(1.0), F32(1.0))

    if shading == GOURAUD:
        g1 = shade_multi_light_color(surf["wn1"], surf["w1"], lights, settings["ambient"])
        g2 = shade_multi_light_color(surf["wn2"], surf["w2"], lights, settings["ambient"])
        g3 = shade_multi_light_color(surf["wn3"], surf["w3"], lights, settings["ambient"])

    vc1, vc2, vc3 = surf["vc1"], surf["vc2"], surf["vc3"]
    # Color PartialEq includes the blend field (types.rs:719-726).
    vcf1 = surf.get("vc1_full", (vc1, OPAQUE))
    vcf2 = surf.get("vc2_full", (vc2, OPAQUE))
    vcf3 = surf.get("vc3_full", (vc3, OPAQUE))
    needs_dither = settings["dithering"] and (
        shading == GOURAUD or texture is not None
        or vcf1 != vcf2 or vcf2 != vcf3)

    area = F32(F32(F32(v2[1] - v3[1]) * F32(v1[0] - v3[0]))
               + F32(F32(v3[0] - v2[0]) * F32(v1[1] - v3[1])))
    if abs(area) < 0.00001:
        return
    inv_area = F32(F32(1.0) / area)

    a0 = F32(v2[1] - v3[1])
    b0 = F32(v3[0] - v2[0])
    a1 = F32(v3[1] - v1[1])
    b1 = F32(v1[0] - v3[0])

    start_x = F32(min_x)
    start_y = F32(min_y)
    w0_row_start = F32(F32(a0 * F32(start_x - v3[0])) + F32(b0 * F32(start_y - v3[1])))
    w1_row_start = F32(F32(a1 * F32(start_x - v3[0])) + F32(b1 * F32(start_y - v3[1])))

    nrows = max_y - min_y
    ncols = max_x - min_x
    w0_rows = _seq_accum(w0_row_start, b0, nrows)
    w1_rows = _seq_accum(w1_row_start, b1, nrows)
    # per row: accumulate a-steps across columns
    w0 = np.add.accumulate(
        np.concatenate([w0_rows[:, None], np.full((nrows, ncols - 1), a0, F32)], axis=1),
        axis=1, dtype=F32)
    w1 = np.add.accumulate(
        np.concatenate([w1_rows[:, None], np.full((nrows, ncols - 1), a1, F32)], axis=1),
        axis=1, dtype=F32)

    bc_x = w0 * inv_area
    bc_y = w1 * inv_area
    bc_z = (F32(1.0) - bc_x) - bc_y

    ERR = F32(-0.0001)
    inside = (bc_x >= ERR) & (bc_y >= ERR) & (bc_z >= ERR)

    inv_z1 = F32(1.0) / F32(v1[2])
    inv_z2 = F32(1.0) / F32(v2[2])
    inv_z3 = F32(1.0) / F32(v3[2])
    izi = (bc_x * inv_z1 + bc_y * inv_z2) + bc_z * inv_z3
    z = F32(1.0) / izi

    ys, xs = np.meshgrid(np.arange(min_y, max_y), np.arange(min_x, max_x),
                         indexing="ij")
    zb = zbuffer[min_y:max_y, min_x:max_x]

    mask = inside.copy()
    if settings["use_zbuffer"] and not settings["xray_mode"]:
        mask &= z < zb

    uv1, uv2, uv3 = surf["uv1"], surf["uv2"], surf["uv3"]
    if settings["affine_textures"]:
        u = (bc_x * F32(uv1[0]) + bc_y * F32(uv2[0])) + bc_z * F32(uv3[0])
        v = (bc_x * F32(uv1[1]) + bc_y * F32(uv2[1])) + bc_z * F32(uv3[1])
    else:
        u_oz = ((bc_x * F32(uv1[0])) * inv_z1 + (bc_y * F32(uv2[0])) * inv_z2) \
            + (bc_z * F32(uv3[0])) * inv_z3
        v_oz = ((bc_x * F32(uv1[1])) * inv_z1 + (bc_y * F32(uv2[1])) * inv_z2) \
            + (bc_z * F32(uv3[1])) * inv_z3
        u = u_oz / izi
        v = v_oz / izi

    # Texture sample (types.rs:671-681) at (u, 1-v).
    if texture is not None:
        tw = texture["pixels"].shape[1]
        th = texture["pixels"].shape[0]
        vv = F32(1.0) - v
        uw = np.fmod(u, F32(1.0))
        uw = np.where(uw < 0, uw + F32(1.0), uw)
        uw = np.where(np.isnan(uw), F32(0.0), uw)
        vw = np.fmod(vv, F32(1.0))
        vw = np.where(vw < 0, vw + F32(1.0), vw)
        vw = np.where(np.isnan(vw), F32(0.0), vw)
        tx = np.minimum(np.trunc(uw * F32(tw)).astype(np.int64), tw - 1)
        ty = np.minimum(np.trunc(vw * F32(th)).astype(np.int64), th - 1)
        c15 = texture["pixels"][ty, tx].astype(np.int32)
    else:
        c15 = np.full(bc_x.shape, 0x7FFF, np.int32)

    r5 = (c15 >> 10) & 0x1F
    g5 = (c15 >> 5) & 0x1F
    b5 = c15 & 0x1F
    is_black = (r5 == 0) & (g5 == 0) & (b5 == 0)
    is_transp = c15 == 0
    if black_transparent:
        mask &= ~is_black
    else:
        c15 = np.where(is_transp, 0x8000, c15)
        r5 = (c15 >> 10) & 0x1F
        g5 = (c15 >> 5) & 0x1F
        b5 = c15 & 0x1F

    tex_r8 = expand_5_to_8(r5)
    tex_g8 = expand_5_to_8(g5)
    tex_b8 = expand_5_to_8(b5)

    def u8cast(x):
        x = np.where(np.isnan(x), F32(0.0), x)
        return np.clip(np.trunc(x), 0, 255).astype(np.int32)

    vr = u8cast((bc_x * F32(vc1[0]) + bc_y * F32(vc2[0])) + bc_z * F32(vc3[0]))
    vg = u8cast((bc_x * F32(vc1[1]) + bc_y * F32(vc2[1])) + bc_z * F32(vc3[1]))
    vb = u8cast((bc_x * F32(vc1[2]) + bc_y * F32(vc2[2])) + bc_z * F32(vc3[2]))

    mod_r8 = np.minimum((tex_r8 * vr) // 128, 255)
    mod_g8 = np.minimum((tex_g8 * vg) // 128, 255)
    mod_b8 = np.minimum((tex_b8 * vb) // 128, 255)

    if shading == NONE:
        sr = sg = sb = np.full(bc_x.shape, F32(1.0))
    elif shading == FLAT:
        sr = np.full(bc_x.shape, flat_shade[0])
        sg = np.full(bc_x.shape, flat_shade[1])
        sb = np.full(bc_x.shape, flat_shade[2])
    else:
        sr = (bc_x * g1[0] + bc_y * g2[0]) + bc_z * g3[0]
        sg = (bc_x * g1[1] + bc_y * g2[1]) + bc_z * g3[1]
        sb = (bc_x * g1[2] + bc_y * g2[2]) + bc_z * g3[2]

    def shade8(m8, s):
        return u8cast(np.minimum(m8.astype(F32) * np.clip(s, F32(0.0), F32(2.0)), F32(255.0)))

    shaded_r8 = shade8(mod_r8, sr)
    shaded_g8 = shade8(mod_g8, sg)
    shaded_b8 = shade8(mod_b8, sb)

    if needs_dither:
        off = PS1_DITHER_MATRIX[ys & 3, xs & 3]
        r5f = np.clip((shaded_r8 + off) >> 3, 0, 31)
        g5f = np.clip((shaded_g8 + off) >> 3, 0, 31)
        b5f = np.clip((shaded_b8 + off) >> 3, 0, 31)
    else:
        r5f = shaded_r8 >> 3
        g5f = shaded_g8 >> 3
        b5f = shaded_b8 >> 3

    all_black = (r5f == 0) & (g5f == 0) & (b5f == 0)
    semi = ((c15 & 0x8000) != 0) | all_black

    front_r8 = expand_5_to_8(r5f)
    front_g8 = expand_5_to_8(g5f)
    front_b8 = expand_5_to_8(b5f)

    editor_alpha = surf["editor_alpha"]
    if editor_alpha == 0:
        return

    back = pixels[min_y:max_y, min_x:max_x]
    back_r = back[..., 0].astype(np.int32)
    back_g = back[..., 1].astype(np.int32)
    back_b = back[..., 2].astype(np.int32)

    # blend_rgb555 (render.rs:1093-1145), plain <<3 expansion at the end.
    f5 = (front_r8 >> 3, front_g8 >> 3, front_b8 >> 3)
    bk5 = (back_r >> 3, back_g >> 3, back_b >> 3)

    def blend5(fc, bc):
        if blend_mode == AVERAGE:
            return np.minimum((bc + fc) // 2, 31) << 3
        if blend_mode == ADD:
            return np.minimum(bc + fc, 31) << 3
        if blend_mode == SUBTRACT:
            return np.maximum(bc - fc, 0) << 3
        if blend_mode == ADD_QUARTER:
            return np.minimum(bc + fc // 4, 31) << 3
        if blend_mode == ERASE:
            return bc << 3
        return fc << 3

    do_blend = semi & (blend_mode != OPAQUE)
    bl = [blend5(f, b) for f, b in zip(f5, bk5)]
    ps1_r = np.where(do_blend, bl[0], front_r8)
    ps1_g = np.where(do_blend, bl[1], front_g8)
    ps1_b = np.where(do_blend, bl[2], front_b8)

    if settings["xray_mode"]:
        out_r = (front_r8 + back_r) // 2
        out_g = (front_g8 + back_g) // 2
        out_b = (front_b8 + back_b) // 2
        zwrite = np.zeros_like(mask)
    elif editor_alpha < 255:
        a = editor_alpha
        ia = 255 - a
        out_r = (ps1_r * a + back_r * ia) // 255
        out_g = (ps1_g * a + back_g * ia) // 255
        out_b = (ps1_b * a + back_b * ia) // 255
        zwrite = mask & settings["use_zbuffer"] & (not skip_z_write)
    else:
        out_r, out_g, out_b = ps1_r, ps1_g, ps1_b
        zwrite = mask & settings["use_zbuffer"] & (not skip_z_write)

    sl = (slice(min_y, max_y), slice(min_x, max_x))
    pix = pixels[sl]
    pix[..., 0] = np.where(mask, out_r, pix[..., 0])
    pix[..., 1] = np.where(mask, out_g, pix[..., 1])
    pix[..., 2] = np.where(mask, out_b, pix[..., 2])
    pix[..., 3] = np.where(mask, 255, pix[..., 3])
    zbuffer[sl] = np.where(zwrite, z, zbuffer[sl])


# =============================================================================
# render_mesh_15 (render.rs:2302-2638)
# =============================================================================

def new_framebuffer(width, height, clear=(0, 0, 0, 0)):
    return {
        "pixels": np.zeros((height, width, 4), np.uint8) + np.asarray(clear, np.uint8),
        "zbuffer": np.full((height, width), np.float32(3.4028235e38)),
    }


def render_mesh_15(fb, vertices, faces, textures, camera, settings,
                   lights, fog=None):
    """vertices: list of dicts {pos, uv, normal, color(rgb), color_blend};
    faces: list of dicts {v0, v1, v2, tex_id, black_transparent, blend_mode,
    editor_alpha}; textures: list of {pixels (h,w) int, blend_mode}."""
    H, W = fb["zbuffer"].shape
    campos = np.asarray(camera["position"], F32)
    bx, by, bz = [np.asarray(camera["basis"][i], F32) for i in range(3)]

    cam_pos_list = []
    projected = []
    for vtx in vertices:
        p = np.asarray(vtx["pos"], F32)
        if settings.get("ortho") is not None:
            o = settings["ortho"]
            rel = _sub3(p, campos)
            cp = perspective_transform(rel, bx, by, bz)
            scr = project_ortho(cp, o["zoom"], o["center_x"], o["center_y"], W, H)
        elif settings["use_fixed_point"]:
            sx, sy, _ = fxg.project_fixed(
                tuple(float(x) for x in p), tuple(float(x) for x in campos),
                tuple(float(x) for x in bx), tuple(float(x) for x in by),
                tuple(float(x) for x in bz), W, H)
            rel = _sub3(p, campos)
            cp = perspective_transform(rel, bx, by, bz)
            scr = np.array([F32(sx), F32(sy), F32(cp[2] + F32(5.0))], F32)
        else:
            rel = _sub3(p, campos)
            cp = perspective_transform(rel, bx, by, bz)
            scr = project(cp, W, H)
        cam_pos_list.append(cp)
        projected.append(scr)

    surfaces = []
    backface_wireframes = []
    frontface_wireframes = []
    for face in faces:
        cv1 = cam_pos_list[face["v0"]]
        cv2 = cam_pos_list[face["v1"]]
        cv3 = cam_pos_list[face["v2"]]
        if settings.get("ortho") is None:
            if cv1[2] <= NEAR_PLANE or cv2[2] <= NEAR_PLANE or cv3[2] <= NEAR_PLANE:
                continue
        v1 = projected[face["v0"]]
        v2 = projected[face["v1"]]
        v3 = projected[face["v2"]]
        signed_area = F32(F32(F32(v2[0] - v1[0]) * F32(v3[1] - v1[1]))
                          - F32(F32(v3[0] - v1[0]) * F32(v2[1] - v1[1])))
        is_backface = signed_area <= 0.0

        tex_id = face.get("tex_id")
        tex_blend = textures[tex_id]["blend_mode"] if tex_id is not None else None
        face_blend = face.get("blend_mode", OPAQUE)
        editor_alpha = face.get("editor_alpha", 255)
        if tex_blend is not None and tex_blend != OPAQUE:
            has_transparency = True
        elif face_blend != OPAQUE:
            has_transparency = True
        else:
            has_transparency = editor_alpha < 255

        def vcol(i):
            vv = vertices[i]
            return tuple(vv.get("color", (128, 128, 128))), vv.get("color_blend", OPAQUE)

        (c1, cb1), (c2, cb2), (c3, cb3) = vcol(face["v0"]), vcol(face["v1"]), vcol(face["v2"])
        if fog is not None:
            start, falloff, cull, fcol = fog
            if cv1[2] > cull and cv2[2] > cull and cv3[2] > cull:
                continue
            f1 = calculate_fog_factor(cv1[2], F32(start), F32(falloff))
            f2 = calculate_fog_factor(cv2[2], F32(start), F32(falloff))
            f3 = calculate_fog_factor(cv3[2], F32(start), F32(falloff))
            c1, cb1 = apply_fog_to_color(c1, cb1, fcol, f1)
            c2, cb2 = apply_fog_to_color(c2, cb2, fcol, f2)
            c3, cb3 = apply_fog_to_color(c3, cb3, fcol, f3)

        def vert(i):
            return vertices[i]

        va, vb_, vc_ = vert(face["v0"]), vert(face["v1"]), vert(face["v2"])
        if is_backface:
            if not settings["xray_mode"]:
                backface_wireframes.append((v1, v2, v3))
            if not settings["backface_cull"] or settings["xray_mode"]:
                surfaces.append(dict(
                    v1=v1, v2=v3, v3=v2,
                    w1=np.asarray(va["pos"], F32), w2=np.asarray(vc_["pos"], F32),
                    w3=np.asarray(vb_["pos"], F32),
                    wn1=_scale3(np.asarray(va["normal"], F32), -1.0),
                    wn2=_scale3(np.asarray(vc_["normal"], F32), -1.0),
                    wn3=_scale3(np.asarray(vb_["normal"], F32), -1.0),
                    uv1=np.asarray(va["uv"], F32), uv2=np.asarray(vc_["uv"], F32),
                    uv3=np.asarray(vb_["uv"], F32),
                    vc1=(c1, cb1), vc2=(c3, cb3), vc3=(c2, cb2),
                    tex_id=tex_id, black_transparent=face.get("black_transparent", True),
                    has_transparency=has_transparency,
                    blend_mode=face_blend, editor_alpha=editor_alpha))
        else:
            surfaces.append(dict(
                v1=v1, v2=v2, v3=v3,
                w1=np.asarray(va["pos"], F32), w2=np.asarray(vb_["pos"], F32),
                w3=np.asarray(vc_["pos"], F32),
                wn1=np.asarray(va["normal"], F32), wn2=np.asarray(vb_["normal"], F32),
                wn3=np.asarray(vc_["normal"], F32),
                uv1=np.asarray(va["uv"], F32), uv2=np.asarray(vb_["uv"], F32),
                uv3=np.asarray(vc_["uv"], F32),
                vc1=(c1, cb1), vc2=(c2, cb2), vc3=(c3, cb3),
                tex_id=tex_id, black_transparent=face.get("black_transparent", True),
                has_transparency=has_transparency,
                blend_mode=face_blend, editor_alpha=editor_alpha))
            if settings.get("wireframe_overlay", False):
                frontface_wireframes.append((v1, v2, v3))

    opaque = [s for s in surfaces if not s["has_transparency"]]
    transparent = [s for s in surfaces if s["has_transparency"]]

    def centroid(s):
        return F32(F32(F32(s["v1"][2] + s["v2"][2]) + s["v3"][2]) / F32(3.0))

    transparent.sort(key=centroid, reverse=True)  # stable ✓
    if not settings["use_zbuffer"]:
        opaque.sort(key=centroid, reverse=True)

    if not settings.get("wireframe_overlay", False):
        for s in opaque:
            _draw(fb, s, textures, settings, lights, skip_z_write=False)
        for s in transparent:
            _draw(fb, s, textures, settings, lights, skip_z_write=True)

    # === WIREFRAME PHASE (render.rs:2573-2633) ===
    if settings["backface_cull"] and settings.get("backface_wireframe", False):
        edges = _dedup_edges(backface_wireframes)
        for (x0, y0, z0, x1, y1, z1) in edges:
            draw_line_3d(fb, x0, y0, z0, x1, y1, z1, (80, 80, 100))
    if settings.get("wireframe_overlay", False) and frontface_wireframes:
        edges = _dedup_edges(frontface_wireframes)
        for (x0, y0, _z0, x1, y1, _z1) in edges:
            draw_line(fb, x0, y0, x1, y1, (200, 200, 220))


def _dedup_edges(tris):
    unique = []
    for (v1, v2, v3) in tris:
        for (a, b) in ((v1, v2), (v2, v3), (v3, v1)):
            x0, y0, z0 = int(a[0]), int(a[1]), F32(a[2])
            x1, y1, z1 = int(b[0]), int(b[1]), F32(b[2])
            edge = ((x0, y0, z0, x1, y1, z1) if (x0, y0) < (x1, y1)
                    else (x1, y1, z1, x0, y0, z0))
            if not any(e[0] == edge[0] and e[1] == edge[1]
                       and e[3] == edge[3] and e[4] == edge[4]
                       for e in unique):
                unique.append(edge)
    return unique


def _bresenham(x0, y0, x1, y1):
    """Yields (x, y, step) per the reference walk (render.rs:768-816)."""
    dx = abs(x1 - x0)
    dy = -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    x, y, step = x0, y0, 0
    while True:
        yield x, y, step
        if x == x1 and y == y1:
            return
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
            step += 1
        if e2 <= dx:
            err += dx
            y += sy
            if e2 < dy:
                step += 1


def draw_line(fb, x0, y0, x1, y1, color):
    """render.rs:715 — opaque Bresenham, no depth test."""
    H, W = fb["zbuffer"].shape
    for x, y, _ in _bresenham(x0, y0, x1, y1):
        if 0 <= x < W and 0 <= y < H:
            fb["pixels"][y, x] = (color[0], color[1], color[2], 255)


def draw_line_3d(fb, x0, y0, z0, x1, y1, z1, color, allow_equal=False):
    """render.rs:768 — depth-tested line; z interpolated by step count; no
    depth write."""
    H, W = fb["zbuffer"].shape
    total = F32(max(abs(x1 - x0), abs(y1 - y0), 1))
    for x, y, step in _bresenham(x0, y0, x1, y1):
        if 0 <= x < W and 0 <= y < H:
            t = F32(F32(step) / total)
            z = F32(z0 + F32(t * F32(z1 - z0)))
            buf = fb["zbuffer"][y, x]
            if (z <= buf) if allow_equal else (z < buf):
                fb["pixels"][y, x] = (color[0], color[1], color[2], 255)


def _draw(fb, s, textures, settings, lights, skip_z_write):
    tex = textures[s["tex_id"]] if s["tex_id"] is not None else None
    surf = dict(s)
    # unwrap (rgb, blend) vertex-color tuples; dither rule compares both.
    vcs = [s["vc1"], s["vc2"], s["vc3"]]
    surf["vc1"], surf["vc2"], surf["vc3"] = [v[0] for v in vcs]
    surf["vc1_full"], surf["vc2_full"], surf["vc3_full"] = vcs
    rasterize_triangle_15(
        fb, surf, tex, s["blend_mode"], s["black_transparent"],
        dict(settings), skip_z_write, lights)
