"""Native C++ RON parser: parity with the pure-Python reference parser."""

import glob
import math

import pytest

from bonnie32_tpu import native
from bonnie32_tpu.io import brotli_io, ron

mod = native.get()
pytestmark = pytest.mark.skipif(mod is None, reason="no C++ toolchain")


def eq(a, b):
    if isinstance(a, ron.Tag) or isinstance(b, ron.Tag):
        return (isinstance(a, ron.Tag) and isinstance(b, ron.Tag)
                and a.name == b.name and eq(a.value, b.value))
    if type(a) is not type(b):
        return False
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


CASES = [
    "(a: 1, b: 2.5, c: -3, d: 0x1F, e: 1_000, f: 1e-3)",
    "[1, 2, 3,]",
    "(1, 2, 3)",
    "()",
    "Some(42)",
    "None",
    "(x: Some((y: true)), z: false)",
    'NwSe',
    'Point(x: 1.0, y: 2.0)',
    'Rgb(1, 2, 3)',
    '"hi \\"there\\" \\n \\u{263A}"',
    "'x'",
    "{ \"k\": 1, \"j\": [2] }",
    "(v: [inf, -inf, NaN])",
    "// comment\n(a: 1 /* inline */, b: 2)",
    "(single,)",          # 1-tuple unwraps to the value
    "(nested: ((1,2),(3,4)))",
]


@pytest.mark.parametrize("text", CASES)
def test_parity_snippets(text):
    assert eq(ron.loads_py(text), mod.ron_loads(text)), text


def test_parity_sample_corpus():
    files = (glob.glob("/root/reference/assets/samples/levels/*.ron")
             + glob.glob("/root/reference/assets/samples/songs/*.ron")
             + glob.glob("/root/reference/assets/samples/assets/*.ron"))
    assert len(files) >= 8
    for f in files:
        raw = brotli_io.maybe_decompress(open(f, "rb").read())
        assert eq(ron.loads_py(raw), mod.ron_loads(raw)), f


def test_errors():
    with pytest.raises(ValueError):
        mod.ron_loads("(a: 1) trailing")
    with pytest.raises(ValueError):
        mod.ron_loads("(a:")
    with pytest.raises(TypeError):
        mod.ron_loads(123)


def test_default_loads_uses_native():
    v = ron.loads("(speed: 5000.0)")
    assert v == {"speed": 5000.0}
    # opt-out still works
    assert ron.loads("(speed: 5000.0)", native=False) == v