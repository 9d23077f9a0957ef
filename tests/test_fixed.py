"""Parity tests: vectorized fixed-point ops vs the scalar golden model.

The golden model (tests/golden/fixed_golden.py) is a literal transcription of
`/root/reference/src/rasterizer/fixed.rs`; these tests establish that the
vectorized TPU implementation computes identical lattices.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bonnie32_tpu.ops import fixed as fx
from golden import fixed_golden as gold


def rand_i32(rng, n, lo=-(2**31), hi=2**31):
    return rng.integers(lo, hi, size=n, dtype=np.int64).astype(np.int32)


def test_unr_table_matches_golden():
    assert fx.UNR_TABLE.tolist() == gold.UNR_TABLE
    # Endpoints per the generating formula (fixed.rs:20-31).
    assert fx.UNR_TABLE[0] == 0xFF
    assert fx.UNR_TABLE[256] == 0x00
    # Monotone non-increasing reciprocal approximation.
    assert all(a >= b for a, b in zip(fx.UNR_TABLE[:-1], fx.UNR_TABLE[1:]))


def test_from_f32_matches_golden():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(-10, 10, 500),
        rng.uniform(-600000, 600000, 500),  # saturation region (|f|*4096 ~ 2^31)
        np.array([0.0, -0.0, 1.0, -1.0, 0.5, 524288.0, -524289.0, np.nan]),
    ]).astype(np.float32)
    ours = np.asarray(fx.from_f32(jnp.asarray(vals)))
    theirs = np.array([gold.from_f32(v) for v in vals], dtype=np.int32)
    np.testing.assert_array_equal(ours, theirs)


def test_mul_fixed_matches_golden():
    rng = np.random.default_rng(1)
    a = rand_i32(rng, 4000)
    b = rand_i32(rng, 4000)
    ours = np.asarray(fx.mul_fixed(jnp.asarray(a), jnp.asarray(b)))
    theirs = np.array([gold.mul_fixed(int(x), int(y)) for x, y in zip(a, b)],
                      dtype=np.int32)
    np.testing.assert_array_equal(ours, theirs)


def test_div_unr_matches_golden_random():
    rng = np.random.default_rng(2)
    num = rand_i32(rng, 8000)
    den = rand_i32(rng, 8000)
    den[:16] = 0  # explicit zero-divisor lanes
    # small divisors stress the normalization
    den[16:64] = rng.integers(-64, 64, 48)
    ours = np.asarray(fx.div_unr(jnp.asarray(num), jnp.asarray(den)))
    theirs = np.array([gold.div_unr(int(n), int(d)) for n, d in zip(num, den)],
                      dtype=np.int32)
    np.testing.assert_array_equal(ours, theirs)


def test_div_unr_reference_unit_tests():
    """The reference's own unit tests (fixed.rs:500-531)."""
    def div_f(a, b):
        r = fx.div_unr(fx.from_f32(jnp.float32(a)), fx.from_f32(jnp.float32(b)))
        return float(np.asarray(fx.to_f32(r)))

    assert abs(div_f(10.0, 3.0) - 10.0 / 3.0) < 0.1
    assert abs(div_f(10.0, 2.0) - 5.0) < 0.01
    assert abs(div_f(-6.0, 2.0) - (-3.0)) < 0.01
    assert abs(div_f(7.5, 1.0) - 7.5) < 0.1


def test_div_unr_has_authentic_error():
    """UNR is intentionally inexact (the source of PS1 jitter)."""
    num = fx.from_f32(jnp.float32(10.0))
    den = fx.from_f32(jnp.float32(3.0))
    r = int(np.asarray(fx.div_unr(num, den)))
    exact = int(round(10.0 / 3.0 * 4096))
    assert r != 0
    assert abs(r - exact) < 64  # close but typically not exact


def test_project_fixed_matches_golden():
    rng = np.random.default_rng(3)
    n = 2000
    world = rng.uniform(-5000, 5000, (n, 3)).astype(np.float32)
    campos = np.array([10.0, -20.0, 5.0], np.float32)
    # orthonormal-ish camera basis
    bx = np.array([0.8, 0.0, 0.6], np.float32)
    by = np.array([0.0, 1.0, 0.0], np.float32)
    bz = np.array([-0.6, 0.0, 0.8], np.float32)
    basis = np.stack([bx, by, bz])

    sx, sy, depth = fx.project_fixed(jnp.asarray(world), jnp.asarray(campos),
                                     jnp.asarray(basis), 320, 240)
    sx, sy, depth = np.asarray(sx), np.asarray(sy), np.asarray(depth)

    for i in range(n):
        gx, gy, gd = gold.project_fixed(
            tuple(world[i]), tuple(campos), tuple(bx), tuple(by), tuple(bz),
            320, 240)
        assert sx[i] == gx, (i, sx[i], gx)
        assert sy[i] == gy, (i, sy[i], gy)
        assert np.float32(depth[i]) == np.float32(gd), (i, depth[i], gd)


def test_projection_outputs_are_integer_snapped():
    """Mirrors fixed.rs:534 test_projection_outputs_integers."""
    world = jnp.asarray(np.array([[1.234, 2.567, 5.0]], np.float32))
    basis = jnp.asarray(np.eye(3, dtype=np.float32))
    campos = jnp.zeros(3, jnp.float32)
    sx, sy, _ = fx.project_fixed(world, campos, basis, 320, 240)
    assert sx.dtype == jnp.int32 and sy.dtype == jnp.int32
    assert -1000 < int(sx[0]) < 1000
    assert -1000 < int(sy[0]) < 1000


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_unr_inregister_formula_covers_every_index():
    """div_unr computes the UNR entry in-register (f32 divide + trunc)
    instead of gathering _UNR_TABLE_DEV; prove the formula reproduces the
    table for ALL 257 indices by exercising every d16 bucket."""
    import jax.numpy as jnp

    idx = np.arange(257, dtype=np.uint32)
    q = np.asarray(jnp.trunc(
        jnp.float32(float(0x40000))
        / (jnp.asarray(idx) + jnp.uint32(0x100)).astype(jnp.float32)
    ).astype(jnp.uint32))
    u_val = np.maximum((q + 1) >> 1, 0x101)
    assert (u_val == fx.UNR_TABLE + 0x101).all()
