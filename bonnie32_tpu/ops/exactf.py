"""Correctly-rounded float32 division and sqrt on TPU.

TPU hardware f32 division/sqrt are NOT correctly rounded (measured: divide up
to 2 ulp, sqrt up to 3 ulp off vs IEEE RN-even), and XLA:TPU's emulated f64 is
a double-float with ~2^-44 relative accuracy on divide — not IEEE either.  The
reference renderer (Rust, IEEE hardware) gets correctly-rounded results, so
pixel-exact parity requires reconstructing them.

What IS reliable on TPU (verified empirically over 1e6+ random samples):
  * f64 multiply of two 24-bit (f32-valued) operands: the 48-bit product is
    exactly representable and comes back exact.
  * f64 subtraction in the Sterbenz zone (operands within a factor of 2) of
    such values: exact.
  * f64 divide / sqrt: accurate to ~2^-44 — far better than the 2^-25 needed
    to identify the two candidate f32 results.

So we use the classic exact-residual candidate correction:
  1. q = RN32(f64_approx_op) — within 1 ulp32 of the true result.
  2. candidates c in {nextafter(q, -inf), q, nextafter(q, +inf)}.
  3. residual r_c = a - c*b (division) or a - c*c (sqrt), computed EXACTLY in
     f64 (48-bit product + Sterbenz subtraction).
  4. pick the candidate minimizing |r_c|; on an exact tie (a/b halfway case)
    pick the one with even mantissa (RN-even).  sqrt of a binary32 value has
    no halfway cases (m^2 of a 25-bit m never fits in 24 bits), so argmin
    suffices there.

These are for *parity-critical* per-vertex / per-triangle work (1/z, 1/area,
normalize, perspective UV).  Hot per-pixel code avoids division entirely by
using inverse-z depth buffers (see ops/raster_*.py).
"""

import jax
import jax.numpy as jnp

_F32 = jnp.float32
_F64 = jnp.float64
_I32 = jnp.int32

_POS_INF32 = jnp.float32(jnp.inf)
_NEG_INF32 = jnp.float32(-jnp.inf)


def _approx_div(a, b):
    """f32 quotient within ~0.6 ulp of correct, with no f64 division.

    XLA:TPU's emulated f64 divide SCALARIZES (compile time explodes linearly
    with array size; measured 4+ minutes for a (700,3) divide) while f64
    multiply/add/sqrt vectorize.  So: hardware f32 divide (<= 2 ulp), then one
    Newton correction using an exact f64 residual (exact because the 24-bit
    product fits f64 and the subtraction is in the Sterbenz zone).
    """
    q0 = a / b
    a64 = a.astype(_F64)
    b64 = b.astype(_F64)
    q064 = q0.astype(_F64)
    r = a64 - q064 * b64
    rb = jnp.float32(1.0) / b           # hw reciprocal, ~2 ulp is plenty
    dq = (r.astype(_F32) * rb).astype(_F64)
    return (q064 + dq).astype(_F32)


def _pick_candidate(q32, resid_fn):
    """Choose among {q-ulp, q, q+ulp} the one with the smallest exact |residual|.

    `resid_fn(c64)` must return the exact residual (monotone-through-zero in
    the candidate).  Ties broken toward even mantissa (IEEE RN-even).
    """
    c_lo = jnp.nextafter(q32, _NEG_INF32)
    c_hi = jnp.nextafter(q32, _POS_INF32)

    def keyed(c32):
        r = jnp.abs(resid_fn(c32.astype(_F64)))
        even = (jax.lax.bitcast_convert_type(c32, _I32) & 1) == 0
        return r, even

    r_lo, e_lo = keyed(c_lo)
    r_mid, e_mid = keyed(q32)
    r_hi, e_hi = keyed(c_hi)

    # lexicographic argmin over (|r|, prefer-even): strictly-smaller residual
    # wins; equal residual (halfway case) -> even mantissa wins.
    best, r_best, e_best = q32, r_mid, e_mid
    take_lo = (r_lo < r_best) | ((r_lo == r_best) & e_lo & ~e_best)
    best = jnp.where(take_lo, c_lo, best)
    r_best = jnp.where(take_lo, r_lo, r_best)
    e_best = jnp.where(take_lo, e_lo, e_best)
    take_hi = (r_hi < r_best) | ((r_hi == r_best) & e_hi & ~e_best)
    best = jnp.where(take_hi, c_hi, best)
    return best


def exact_div(a, b):
    """Correctly-rounded float32 a / b for finite inputs.

    Non-finite / zero-denominator cases fall back to the f64 approximation
    (sign-correct inf/nan); the renderer guards those paths anyway.
    """
    a = jnp.asarray(a, _F32)
    b = jnp.asarray(b, _F32)
    a64 = a.astype(_F64)
    b64 = b.astype(_F64)
    q32 = _approx_div(a, b)

    fixable = jnp.isfinite(q32) & (q32 != 0.0)
    # Avoid inf/nan residue garbage in the masked-out lanes.
    safe_q = jnp.where(fixable, q32, jnp.float32(1.0))
    corrected = _pick_candidate(safe_q, lambda c64: a64 - c64 * b64)
    return jnp.where(fixable, corrected, q32)


def exact_recip(a):
    """Correctly-rounded float32 1.0 / a."""
    a = jnp.asarray(a, _F32)
    return exact_div(jnp.ones_like(a), a)


def exact_sqrt(a):
    """Correctly-rounded float32 sqrt(a) for finite non-negative inputs."""
    a = jnp.asarray(a, _F32)
    a64 = a.astype(_F64)
    q32 = jnp.sqrt(a64).astype(_F32)

    fixable = jnp.isfinite(q32) & (q32 > 0.0)
    safe_q = jnp.where(fixable, q32, jnp.float32(1.0))
    corrected = _pick_candidate(safe_q, lambda c64: a64 - c64 * c64)
    return jnp.where(fixable, corrected, q32)
