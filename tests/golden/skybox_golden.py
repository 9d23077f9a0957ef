"""Scalar transcription of fb.render_skybox + render_stars
(`/root/reference/src/rasterizer/render.rs:81-299`): project the generated
sphere+mountain mesh, rasterize each inward-facing triangle with
half-pixel-centered barycentrics and u8-truncated Gouraud colors
(no depth), then draw LCG-star diamond sparkles.  Used as the oracle for
ops/skybox.render_skybox(exact=True)."""

import math

import numpy as np

F32 = np.float32


def project(v, width, height):
    """math.rs:117-136 (same helper as raster_golden)."""
    ud = F32(5.0)
    us = F32(4.0)
    vs = F32(F32(min(width, height) / 2.0) * F32(0.75))
    denom = F32(v[2] + ud)
    x = F32(F32(F32(F32(v[0] * us) / denom) * vs) + F32(width / 2.0))
    y = F32(F32(F32(F32(v[1] * us) / denom) * vs) + F32(height / 2.0))
    return x, y


def perspective_transform(v, basis):
    bx, by, bz = basis
    return (F32(v[0] * bx[0] + v[1] * bx[1] + v[2] * bx[2]),
            F32(v[0] * by[0] + v[1] * by[1] + v[2] * by[2]),
            F32(v[0] * bz[0] + v[1] * bz[1] + v[2] * bz[2]))


def render_skybox_scalar(pixels, dirs, colors, faces, basis,
                         star_spec=None, time=0.0):
    """pixels: (H, W, 3) uint8 modified in place.  dirs scaled unit
    directions; colors (V,3) u8; faces (F,3)."""
    height, width = pixels.shape[:2]

    projected = []
    for d in dirs:
        world = (F32(d[0] * 10000.0), F32(d[1] * 10000.0),
                 F32(d[2] * 10000.0))
        cam = perspective_transform(world, basis)
        if cam[2] <= 0.1:
            projected.append(None)
            continue
        x, y = project(cam, width, height)
        projected.append((x, y))

    for f in faces:
        p0, p1, p2 = projected[f[0]], projected[f[1]], projected[f[2]]
        if p0 is None or p1 is None or p2 is None:
            continue
        signed = F32((p1[0] - p0[0]) * (p2[1] - p0[1])
                     - (p2[0] - p0[0]) * (p1[1] - p0[1]))
        if signed >= 0.0:
            continue
        c0 = colors[f[0]].astype(np.float64)
        c1 = colors[f[1]].astype(np.float64)
        c2 = colors[f[2]].astype(np.float64)

        min_x = int(max(min(p0[0], p1[0], p2[0]), 0.0))
        max_x = int(min(max(p0[0], p1[0], p2[0]), width - 1.0))
        min_y = int(max(min(p0[1], p1[1], p2[1]), 0.0))
        max_y = int(min(max(p0[1], p1[1], p2[1]), height - 1.0))
        if min_x > max_x or min_y > max_y:
            continue
        denom = F32((p1[1] - p2[1]) * (p0[0] - p2[0])
                    + (p2[0] - p1[0]) * (p0[1] - p2[1]))
        if abs(denom) < 0.0001:
            continue
        inv = F32(1.0 / denom)
        for y in range(min_y, max_y + 1):
            for x in range(min_x, max_x + 1):
                px = F32(x + 0.5)
                py = F32(y + 0.5)
                w0 = F32(((p1[1] - p2[1]) * (px - p2[0])
                          + (p2[0] - p1[0]) * (py - p2[1])) * inv)
                w1 = F32(((p2[1] - p0[1]) * (px - p2[0])
                          + (p0[0] - p2[0]) * (py - p2[1])) * inv)
                w2 = F32(1.0 - w0 - w1)
                if w0 >= 0.0 and w1 >= 0.0 and w2 >= 0.0:
                    r = int(F32(c0[0] * w0 + c1[0] * w1 + c2[0] * w2))
                    g = int(F32(c0[1] * w0 + c1[1] * w1 + c2[1] * w2))
                    b = int(F32(c0[2] * w0 + c1[2] * w1 + c2[2] * w2))
                    pixels[y, x, 0] = min(max(r, 0), 255)
                    pixels[y, x, 1] = min(max(g, 0), 255)
                    pixels[y, x, 2] = min(max(b, 0), 255)

    if star_spec is not None:
        render_stars_scalar(pixels, star_spec, basis, time)
    return pixels


def render_stars_scalar(pixels, star_spec, basis, time):
    """render.rs:149-237: star_spec = dict(dirs (S,3), phase (S,), color
    (3,), size, twinkle, enabled)."""
    if not star_spec.get("enabled", True):
        return
    height, width = pixels.shape[:2]
    size = star_spec["size"]
    twinkle = star_spec["twinkle"]
    base = star_spec["color"]

    def put(x, y, c):
        if 0 <= x < width and 0 <= y < height:
            pixels[y, x, 0] = c[0]
            pixels[y, x, 1] = c[1]
            pixels[y, x, 2] = c[2]

    for d, phase in zip(star_spec["dirs"], star_spec["phase"]):
        world = (F32(d[0] * 10000.0), F32(d[1] * 10000.0),
                 F32(d[2] * 10000.0))
        cam = perspective_transform(world, basis)
        if cam[2] <= 0.1:
            continue
        sx, sy = project(cam, width, height)
        brightness = 1.0
        if twinkle > 0.0:
            brightness = F32(0.5 + 0.5 * math.sin(
                F32(time * twinkle + phase)))
        cx, cy = int(sx), int(sy)
        color = tuple(int(F32(b) * F32(brightness)) for b in base)
        s = max(int(size), 1)
        put(cx, cy, color)
        if s >= 2:
            dim = tuple(int(F32(c) * F32(0.7)) for c in color)
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                put(cx + dx, cy + dy, dim)
        if s >= 3:
            faint = tuple(int(F32(c) * F32(0.4)) for c in color)
            for dx, dy in ((-2, 0), (2, 0), (0, -2), (0, 2)):
                put(cx + dx, cy + dy, faint)
