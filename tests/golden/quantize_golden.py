"""Literal scalar transcription of modeler/quantize.rs for parity testing."""

import numpy as np

DELTA = 6.0 / 29.0


def f32(x):
    return np.float32(x)


def srgb_to_linear(v):
    v = f32(v)
    return f32(v / f32(12.92)) if v <= 0.04045 else f32(
        (f32(f32(v + f32(0.055)) / f32(1.055))) ** f32(2.4))


def linear_to_srgb(v):
    v = f32(v)
    return f32(v * f32(12.92)) if v <= 0.0031308 else f32(
        f32(1.055) * f32(max(v, 0) ** f32(1.0 / 2.4)) - f32(0.055))


def lab_f(t):
    t = f32(t)
    if t > DELTA ** 3:
        return f32(np.cbrt(t))
    return f32(t / f32(3 * DELTA * DELTA) + f32(4.0 / 29.0))


def lab_f_inv(t):
    t = f32(t)
    if t > DELTA:
        return f32(t * t * t)
    return f32(f32(3 * DELTA * DELTA) * f32(t - f32(4.0 / 29.0)))


def lab_from_rgb(r, g, b):
    rl = srgb_to_linear(r / 255.0)
    gl = srgb_to_linear(g / 255.0)
    bl = srgb_to_linear(b / 255.0)
    x = f32(rl * f32(0.4124564) + gl * f32(0.3575761) + bl * f32(0.1804375))
    y = f32(rl * f32(0.2126729) + gl * f32(0.7151522) + bl * f32(0.0721750))
    z = f32(rl * f32(0.0193339) + gl * f32(0.1191920) + bl * f32(0.9503041))
    fx = lab_f(x / f32(0.95047))
    fy = lab_f(y / f32(1.0))
    fz = lab_f(z / f32(1.08883))
    return (f32(116.0 * fy - 16.0), f32(500.0 * (fx - fy)),
            f32(200.0 * (fy - fz)))


def lab_to_rgb(l, a, b):
    fy = f32((l + 16.0) / 116.0)
    fx = f32(a / 500.0 + fy)
    fz = f32(fy - b / 200.0)
    x = f32(f32(0.95047) * lab_f_inv(fx))
    y = f32(f32(1.0) * lab_f_inv(fy))
    z = f32(f32(1.08883) * lab_f_inv(fz))
    rl = f32(x * f32(3.2404542) + y * f32(-1.5371385) + z * f32(-0.4985314))
    gl = f32(x * f32(-0.9692660) + y * f32(1.8760108) + z * f32(0.0415560))
    bl = f32(x * f32(0.0556434) + y * f32(-0.2040259) + z * f32(1.0572252))
    out = []
    for v in (rl, gl, bl):
        out.append(int(np.clip(np.trunc(linear_to_srgb(v) * 255.0), 0, 255)))
    return tuple(out)


def pack15(r5, g5, b5):
    return (min(int(r5), 31) << 10) | (min(int(g5), 31) << 5) | min(int(b5), 31)


def r5(c):
    return (c >> 10) & 0x1F


def g5(c):
    return (c >> 5) & 0x1F


def b5(c):
    return c & 0x1F


def lab_from_color15(c):
    r = (r5(c) * 255) // 31
    g = (g5(c) * 255) // 31
    b = (b5(c) * 255) // 31
    return lab_from_rgb(r, g, b)


def make_qcolor(c, opts):
    r, g, b = float(r5(c)), float(g5(c)), float(b5(c))
    mx, mn = max(r, g, b), min(r, g, b)
    sat = (mx - mn) / mx if mx > 0 else 0.0
    if opts["use_lab"]:
        c0, c1, c2 = lab_from_color15(c)
    else:
        c0 = r
        c1 = f32(g * f32(1.0 + opts["perceptual_weight"] * 0.5))
        c2 = b
    return dict(c0=float(c0), c1=float(c1), c2=float(c2), orig=c, sat=sat)


def bucket_ranges(bucket):
    c0 = [q["c0"] for q in bucket]
    c1 = [q["c1"] for q in bucket]
    c2 = [q["c2"] for q in bucket]
    return (max(c0) - min(c0), max(c1) - min(c1), max(c2) - min(c2))


def bucket_volume(bucket):
    if not bucket:
        return 0.0
    a, b, c = bucket_ranges(bucket)
    return a * b * c


def find_bucket_to_split(buckets, opts, min_size):
    best = None
    best_score = None
    for i, b in enumerate(buckets):
        if len(b) <= 1 or len(b) <= min_size or bucket_volume(b) <= 0.0:
            continue
        if opts["mode"] == "preserve_detail":
            score = len(set(q["orig"] for q in b))
        elif opts["mode"] == "smooth":
            score = bucket_volume(b)
        else:
            score = sum(1.0 + q["sat"] * opts["saturation_bias"] for q in b)
        if best_score is None or score >= best_score:  # Rust max_by: last max
            best, best_score = i, score
    return best


def average_color(bucket, opts):
    if opts["use_lab"]:
        n = len(bucket)
        l = sum(q["c0"] for q in bucket) / n
        a = sum(q["c1"] for q in bucket) / n
        b = sum(q["c2"] for q in bucket) / n
        r, g, bb = lab_to_rgb(f32(l), f32(a), f32(b))
        return pack15(r >> 3, g >> 3, bb >> 3)
    n = len(bucket)
    rs = sum(r5(q["orig"]) for q in bucket)
    gs = sum(g5(q["orig"]) for q in bucket)
    bs = sum(b5(q["orig"]) for q in bucket)
    return pack15(rs // n, gs // n, bs // n)


def merge_small_buckets(buckets, min_size, opts):
    def center(b):
        n = len(b)
        return (sum(q["c0"] for q in b) / n, sum(q["c1"] for q in b) / n,
                sum(q["c2"] for q in b) / n)

    while len(buckets) > 1:
        small_i = None
        small_n = None
        for i, b in enumerate(buckets):
            if len(b) < min_size and (small_n is None or len(b) < small_n):
                small_i, small_n = i, len(b)
        if small_i is None:
            break
        small = buckets.pop(small_i)
        sc = center(small)
        best_i, best_d = 0, None
        for i, b in enumerate(buckets):
            c = center(b)
            d = sum((sc[k] - c[k]) ** 2 for k in range(3))
            if best_d is None or d < best_d:
                best_i, best_d = i, d
        buckets[best_i] = buckets[best_i] + small
    return buckets


def median_cut(colors, max_colors, total_pixels, opts):
    if not colors:
        return [0x7FFF]
    uniq = sorted(set(colors))
    if len(uniq) <= max_colors:
        return uniq
    qcolors = [make_qcolor(c, opts) for c in colors]
    buckets = [qcolors]
    min_size = int(total_pixels * opts["min_bucket_fraction"])
    while len(buckets) < max_colors:
        si = find_bucket_to_split(buckets, opts, min_size)
        if si is None:
            break
        bucket = buckets.pop(si)
        r0, r1, r2 = bucket_ranges(bucket)
        axis = 0 if (r0 >= r1 and r0 >= r2) else (1 if r1 >= r2 else 2)
        key = ["c0", "c1", "c2"][axis]
        s = sorted(bucket, key=lambda q: q[key])  # stable, like Rust sort_by
        mid = len(s) // 2
        if s[:mid]:
            buckets.append(s[:mid])
        if s[mid:]:
            buckets.append(s[mid:])
    if min_size > 0 and len(buckets) > 1:
        buckets = merge_small_buckets(buckets, min_size, opts)
    return [average_color(b, opts) for b in buckets]


def find_nearest(c, palette, pw):
    best_i, best_d = 0, None
    gw = 1.0 + pw
    for i, p in enumerate(palette):
        dr = abs(float(r5(c)) - float(r5(p)))
        dg = abs(float(g5(c)) - float(g5(p)))
        db = abs(float(b5(c)) - float(b5(p)))
        d = dr * dr + dg * dg * gw + db * db
        if best_d is None or d < best_d:
            best_i, best_d = i, d
        if d == 0.0:
            break
    return best_i


def find_nearest_lab(lab, pal_lab):
    best_i, best_d = 0, None
    for i, p in enumerate(pal_lab):
        d = sum((lab[k] - p[k]) ** 2 for k in range(3))
        if best_d is None or d < best_d:
            best_i, best_d = i, d
        if d == 0.0:
            break
    return best_i


def quantize_image(rgba, width, height, target_colors, opts):
    """quantize.rs:296 -> (indices list, clut colors list)."""
    px = np.asarray(rgba, np.uint8).reshape(-1, 4)
    colors = []
    for p in px:
        if p[3] == 0:
            continue
        if opts["pre_quantize"] > 0:
            r, g, b = (p[0] >> 4) << 4, (p[1] >> 4) << 4, (p[2] >> 4) << 4
        else:
            r, g, b = p[0], p[1], p[2]
        colors.append(pack15(r >> 3, g >> 3, b >> 3))
    if not colors:
        palette = [0x7FFF]
    else:
        palette = median_cut(colors, max(target_colors - 1, 1),
                             width * height, opts)
    clut = [0] * target_colors
    for i, c in enumerate(palette):
        if i + 1 < target_colors:
            clut[i + 1] = c
    pal_lab = ([lab_from_color15(c) for c in palette]
               if opts["use_lab"] else None)
    indices = []
    for p in px:
        if p[3] == 0:
            indices.append(0)
            continue
        if opts["pre_quantize"] > 0:
            r, g, b = (p[0] >> 4) << 4, (p[1] >> 4) << 4, (p[2] >> 4) << 4
        else:
            r, g, b = p[0], p[1], p[2]
        if opts["use_lab"] and pal_lab:
            indices.append(find_nearest_lab(lab_from_rgb(r, g, b), pal_lab) + 1)
        else:
            c = pack15(r >> 3, g >> 3, b >> 3)
            indices.append(find_nearest(c, palette,
                                        opts["perceptual_weight"]) + 1)
    return indices, clut


def default_opts(**kw):
    d = dict(mode="standard", use_lab=False, pre_quantize=0,
             perceptual_weight=0.0, saturation_bias=0.0,
             min_bucket_fraction=0.0)
    d.update(kw)
    return d
