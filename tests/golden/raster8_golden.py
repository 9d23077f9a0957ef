"""Scalar/bbox-vectorized golden model of the 8-bit render path
(render.rs:1202 rasterize_triangle, :1971 render_mesh)."""

import numpy as np

from . import raster_golden as rg

F32 = np.float32
OPAQUE, AVERAGE, ADD, SUBTRACT, ADD_QUARTER, ERASE = range(6)
NEAR_PLANE = rg.NEAR_PLANE


def rasterize_triangle8(fb, surf, texture, settings, lights):
    """render.rs:1202 — full-8-bit triangle."""
    pixels = fb["pixels"]
    zbuffer = fb["zbuffer"]
    H, W = zbuffer.shape
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
    if shading == rg.FLAT:
        center = rg._scale3(rg._add3(rg._add3(surf["w1"], surf["w2"]),
                                     surf["w3"]), F32(1.0 / 3.0))
        wn = rg._normalize3(rg._scale3(
            rg._add3(rg._add3(surf["wn1"], surf["wn2"]), surf["wn3"]),
            F32(1.0 / 3.0)))
        flat_shade = rg.shade_multi_light_color(wn, center, lights,
                                                settings["ambient"])
    else:
        flat_shade = (F32(1.0), F32(1.0), F32(1.0))
    if shading == rg.GOURAUD:
        g1 = rg.shade_multi_light_color(surf["wn1"], surf["w1"], lights,
                                        settings["ambient"])
        g2 = rg.shade_multi_light_color(surf["wn2"], surf["w2"], lights,
                                        settings["ambient"])
        g3 = rg.shade_multi_light_color(surf["wn3"], surf["w3"], lights,
                                        settings["ambient"])

    vc1, vc2, vc3 = surf["vc1"], surf["vc2"], surf["vc3"]
    vcf1 = surf.get("vc1_full", (vc1, OPAQUE))
    vcf2 = surf.get("vc2_full", (vc2, OPAQUE))
    vcf3 = surf.get("vc3_full", (vc3, OPAQUE))
    needs_dither = settings["dithering"] and (
        shading == rg.GOURAUD or texture is not None
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
    w0s = F32(F32(a0 * F32(start_x - v3[0])) + F32(b0 * F32(start_y - v3[1])))
    w1s = F32(F32(a1 * F32(start_x - v3[0])) + F32(b1 * F32(start_y - v3[1])))
    nrows = max_y - min_y
    ncols = max_x - min_x
    w0r = rg._seq_accum(w0s, b0, nrows)
    w1r = rg._seq_accum(w1s, b1, nrows)
    w0 = np.add.accumulate(np.concatenate(
        [w0r[:, None], np.full((nrows, ncols - 1), a0, F32)], axis=1),
        axis=1, dtype=F32)
    w1 = np.add.accumulate(np.concatenate(
        [w1r[:, None], np.full((nrows, ncols - 1), a1, F32)], axis=1),
        axis=1, dtype=F32)

    bc_x = w0 * inv_area
    bc_y = w1 * inv_area
    bc_z = (F32(1.0) - bc_x) - bc_y
    ERR = F32(-0.0001)
    mask = (bc_x >= ERR) & (bc_y >= ERR) & (bc_z >= ERR)

    inv_z1 = F32(1.0) / F32(v1[2])
    inv_z2 = F32(1.0) / F32(v2[2])
    inv_z3 = F32(1.0) / F32(v3[2])
    izi = (bc_x * inv_z1 + bc_y * inv_z2) + bc_z * inv_z3
    z = F32(1.0) / izi

    zb = zbuffer[min_y:max_y, min_x:max_x]
    if settings["use_zbuffer"]:
        mask = mask & (z < zb)

    uv1, uv2, uv3 = surf["uv1"], surf["uv2"], surf["uv3"]
    if settings["affine_textures"]:
        u = (bc_x * F32(uv1[0]) + bc_y * F32(uv2[0])) + bc_z * F32(uv3[0])
        v = (bc_x * F32(uv1[1]) + bc_y * F32(uv2[1])) + bc_z * F32(uv3[1])
    else:
        u_oz = ((bc_x * F32(uv1[0])) * inv_z1
                + (bc_y * F32(uv2[0])) * inv_z2) \
            + (bc_z * F32(uv3[0])) * inv_z3
        v_oz = ((bc_x * F32(uv1[1])) * inv_z1
                + (bc_y * F32(uv2[1])) * inv_z2) \
            + (bc_z * F32(uv3[1])) * inv_z3
        u = u_oz / izi
        v = v_oz / izi

    if texture is not None:
        rgba = texture["rgba"]
        th, tw = rgba.shape[:2]
        vv = F32(1.0) - v
        uw = np.fmod(u, F32(1.0))
        uw = np.where(uw < 0, uw + F32(1.0), uw)
        uw = np.where(np.isnan(uw), F32(0.0), uw)
        vw = np.fmod(vv, F32(1.0))
        vw = np.where(vw < 0, vw + F32(1.0), vw)
        vw = np.where(np.isnan(vw), F32(0.0), vw)
        tx = np.minimum(np.trunc(uw * F32(tw)).astype(np.int64), tw - 1)
        ty = np.minimum(np.trunc(vw * F32(th)).astype(np.int64), th - 1)
        texel = rgba[ty, tx].astype(np.int32)
        tr, tg, tb = texel[..., 0], texel[..., 1], texel[..., 2]
        tblend = np.where(texel[..., 3] == 0, ERASE, OPAQUE)
    else:
        tr = np.full(bc_x.shape, 255, np.int32)
        tg = np.full(bc_x.shape, 255, np.int32)
        tb = np.full(bc_x.shape, 255, np.int32)
        tblend = np.full(bc_x.shape, OPAQUE, np.int32)

    # Erase texels skip (render.rs:1349)
    mask = mask & (tblend != ERASE)

    def u8cast(x):
        x = np.where(np.isnan(x), F32(0.0), x)
        return np.clip(np.trunc(x), 0, 255).astype(np.int32)

    vr = u8cast((bc_x * F32(vc1[0]) + bc_y * F32(vc2[0])) + bc_z * F32(vc3[0]))
    vg = u8cast((bc_x * F32(vc1[1]) + bc_y * F32(vc2[1])) + bc_z * F32(vc3[1]))
    vb = u8cast((bc_x * F32(vc1[2]) + bc_y * F32(vc2[2])) + bc_z * F32(vc3[2]))

    mr = np.minimum((tr * vr) // 128, 255)
    mg = np.minimum((tg * vg) // 128, 255)
    mb = np.minimum((tb * vb) // 128, 255)

    if shading == rg.NONE:
        sr = sg = sb = np.full(bc_x.shape, F32(1.0))
    elif shading == rg.FLAT:
        sr = np.full(bc_x.shape, flat_shade[0])
        sg = np.full(bc_x.shape, flat_shade[1])
        sb = np.full(bc_x.shape, flat_shade[2])
    else:
        sr = (bc_x * g1[0] + bc_y * g2[0]) + bc_z * g3[0]
        sg = (bc_x * g1[1] + bc_y * g2[1]) + bc_z * g3[1]
        sb = (bc_x * g1[2] + bc_y * g2[2]) + bc_z * g3[2]

    def shade_mul(m8, s):
        return np.clip(np.trunc(np.minimum(m8.astype(F32) * s, F32(255.0))),
                       0, 255).astype(np.int32)

    r8 = shade_mul(mr, sr)
    g8 = shade_mul(mg, sg)
    b8 = shade_mul(mb, sb)

    if needs_dither:
        ys, xs = np.meshgrid(np.arange(min_y, max_y),
                             np.arange(min_x, max_x), indexing="ij")
        off = rg.PS1_DITHER_MATRIX[ys & 3, xs & 3]
        r8 = np.clip((r8 + off) >> 3, 0, 31) << 3
        g8 = np.clip((g8 + off) >> 3, 0, 31) << 3
        b8 = np.clip((b8 + off) >> 3, 0, 31) << 3

    # blend with framebuffer (texel blend; normally OPAQUE)
    back = pixels[min_y:max_y, min_x:max_x].astype(np.int32)
    br, bg_, bb = back[..., 0], back[..., 1], back[..., 2]
    fr = np.select(
        [tblend == AVERAGE, tblend == ADD, tblend == SUBTRACT,
         tblend == ADD_QUARTER],
        [(br + r8) // 2, np.minimum(br + r8, 255), np.maximum(br - r8, 0),
         np.minimum(br + r8 // 4, 255)], r8)
    fg = np.select(
        [tblend == AVERAGE, tblend == ADD, tblend == SUBTRACT,
         tblend == ADD_QUARTER],
        [(bg_ + g8) // 2, np.minimum(bg_ + g8, 255), np.maximum(bg_ - g8, 0),
         np.minimum(bg_ + g8 // 4, 255)], g8)
    fb8 = np.select(
        [tblend == AVERAGE, tblend == ADD, tblend == SUBTRACT,
         tblend == ADD_QUARTER],
        [(bb + b8) // 2, np.minimum(bb + b8, 255), np.maximum(bb - b8, 0),
         np.minimum(bb + b8 // 4, 255)], b8)

    ea = surf.get("editor_alpha", 255)
    if ea == 0:
        return
    if ea < 255:
        a = F32(ea) / F32(255.0)
        inv = F32(1.0) - a
        fr = np.clip(np.trunc(fr.astype(F32) * a + br.astype(F32) * inv),
                     0, 255).astype(np.int32)
        fg = np.clip(np.trunc(fg.astype(F32) * a + bg_.astype(F32) * inv),
                     0, 255).astype(np.int32)
        fb8 = np.clip(np.trunc(fb8.astype(F32) * a + bb.astype(F32) * inv),
                      0, 255).astype(np.int32)

    region = pixels[min_y:max_y, min_x:max_x]
    region[..., 0] = np.where(mask, fr, region[..., 0])
    region[..., 1] = np.where(mask, fg, region[..., 1])
    region[..., 2] = np.where(mask, fb8, region[..., 2])
    region[..., 3] = np.where(mask, 255, region[..., 3])
    if settings["use_zbuffer"]:
        zbuffer[min_y:max_y, min_x:max_x] = np.where(mask, z, zb)


def render_mesh8(fb, vertices, faces, textures, camera, settings, lights,
                 fog=None):
    """render.rs:1971 — single-pass 8-bit mesh render."""
    H, W = fb["zbuffer"].shape
    campos = np.asarray(camera["position"], F32)
    bx, by, bz = [np.asarray(camera["basis"][i], F32) for i in range(3)]

    cams, projs = [], []
    for vtx in vertices:
        p = np.asarray(vtx["pos"], F32)
        rel = rg._sub3(p, campos)
        cp = rg.perspective_transform(rel, bx, by, bz)
        if settings["use_fixed_point"]:
            from . import fixed_golden as fxg
            sx, sy, _ = fxg.project_fixed(
                tuple(float(x) for x in p), tuple(float(x) for x in campos),
                tuple(float(x) for x in bx), tuple(float(x) for x in by),
                tuple(float(x) for x in bz), W, H)
            scr = np.array([F32(sx), F32(sy), F32(cp[2] + F32(5.0))], F32)
        else:
            scr = rg.project(cp, W, H)
        cams.append(cp)
        projs.append(scr)

    surfaces = []
    for face in faces:
        cv1, cv2, cv3 = (cams[face["v0"]], cams[face["v1"]], cams[face["v2"]])
        if cv1[2] <= NEAR_PLANE or cv2[2] <= NEAR_PLANE \
                or cv3[2] <= NEAR_PLANE:
            continue
        v1, v2, v3 = projs[face["v0"]], projs[face["v1"]], projs[face["v2"]]
        signed_area = F32(F32(F32(v2[0] - v1[0]) * F32(v3[1] - v1[1]))
                          - F32(F32(v3[0] - v1[0]) * F32(v2[1] - v1[1])))
        is_backface = signed_area <= 0.0

        def vcol(i):
            vv = vertices[i]
            return (tuple(vv.get("color", (128, 128, 128))),
                    vv.get("color_blend", OPAQUE))

        (c1, cb1), (c2, cb2), (c3, cb3) = (vcol(face["v0"]),
                                           vcol(face["v1"]),
                                           vcol(face["v2"]))
        if fog is not None:
            start, falloff, cull, fcol = fog
            if cv1[2] > cull and cv2[2] > cull and cv3[2] > cull:
                continue
            f1 = rg.calculate_fog_factor(cv1[2], F32(start), F32(falloff))
            f2 = rg.calculate_fog_factor(cv2[2], F32(start), F32(falloff))
            f3 = rg.calculate_fog_factor(cv3[2], F32(start), F32(falloff))
            c1, cb1 = rg.apply_fog_to_color(c1, cb1, fcol, f1)
            c2, cb2 = rg.apply_fog_to_color(c2, cb2, fcol, f2)
            c3, cb3 = rg.apply_fog_to_color(c3, cb3, fcol, f3)

        va, vb_, vc_ = (vertices[face["v0"]], vertices[face["v1"]],
                        vertices[face["v2"]])
        if is_backface:
            if (not settings["backface_cull"]) or settings["xray_mode"]:
                surfaces.append(dict(
                    v1=v1, v2=v3, v3=v2,
                    w1=np.asarray(va["pos"], F32),
                    w2=np.asarray(vc_["pos"], F32),
                    w3=np.asarray(vb_["pos"], F32),
                    wn1=rg._scale3(np.asarray(va["normal"], F32), -1.0),
                    wn2=rg._scale3(np.asarray(vc_["normal"], F32), -1.0),
                    wn3=rg._scale3(np.asarray(vb_["normal"], F32), -1.0),
                    uv1=np.asarray(va["uv"], F32),
                    uv2=np.asarray(vc_["uv"], F32),
                    uv3=np.asarray(vb_["uv"], F32),
                    vc1=c1, vc2=c3, vc3=c2,
                    vc1_full=(c1, cb1), vc2_full=(c3, cb3),
                    vc3_full=(c2, cb2),
                    tex_id=face.get("tex_id"),
                    editor_alpha=face.get("editor_alpha", 255)))
        else:
            surfaces.append(dict(
                v1=v1, v2=v2, v3=v3,
                w1=np.asarray(va["pos"], F32), w2=np.asarray(vb_["pos"], F32),
                w3=np.asarray(vc_["pos"], F32),
                wn1=np.asarray(va["normal"], F32),
                wn2=np.asarray(vb_["normal"], F32),
                wn3=np.asarray(vc_["normal"], F32),
                uv1=np.asarray(va["uv"], F32), uv2=np.asarray(vb_["uv"], F32),
                uv3=np.asarray(vc_["uv"], F32),
                vc1=c1, vc2=c2, vc3=c3,
                vc1_full=(c1, cb1), vc2_full=(c2, cb2), vc3_full=(c3, cb3),
                tex_id=face.get("tex_id"),
                editor_alpha=face.get("editor_alpha", 255)))

    if not settings["use_zbuffer"]:
        def centroid(s):
            return F32(F32(F32(s["v1"][2] + s["v2"][2]) + s["v3"][2])
                       / F32(3.0))
        surfaces.sort(key=centroid, reverse=True)

    for s in surfaces:
        tex = textures[s["tex_id"]] if s["tex_id"] is not None else None
        rasterize_triangle8(fb, s, tex, settings, lights)
