"""Hover detection: vertex > edge > face priority and thresholds."""

import numpy as np

from bonnie32_tpu.editor.hover import (detect_hover, detect_object_hover,
                                       HoverResult)
from bonnie32_tpu.ops import picking as pk

W, H = 320, 240
BASIS = np.eye(3, dtype=np.float32)
CAMPOS = np.array([0, 0, -10], np.float32)


def quad_at(z, size=2.0, cx=0.0, cy=0.0):
    s = size / 2
    return np.array([[cx - s, cy - s, z], [cx + s, cy - s, z],
                     [cx + s, cy + s, z], [cx - s, cy + s, z]], np.float32)


def screen_of(p):
    sx, sy, _, _ = pk.world_to_screen(np.asarray(p, np.float32), CAMPOS,
                                      BASIS, W, H)
    return float(sx), float(sy)


def test_vertex_beats_edge_beats_face():
    q = quad_at(2.0)
    quads = [("q0", q)]
    # exactly on corner 0: all three types hit; vertex wins
    mx, my = screen_of(q[0])
    r = detect_hover(mx, my, quads, CAMPOS, BASIS, W, H)
    assert r.kind == "vertex" and r.corner == 0 and r.tag == "q0"
    # on the middle of edge 0 (away from corners): edge beats face
    mid = (q[0] + q[1]) / 2
    mx, my = screen_of(mid)
    r = detect_hover(mx, my, quads, CAMPOS, BASIS, W, H)
    assert r.kind == "edge" and r.edge == 0
    # interior: face
    mx, my = screen_of(q.mean(axis=0))
    r = detect_hover(mx, my, quads, CAMPOS, BASIS, W, H)
    assert r.kind == "face" and r.tag == "q0"
    # far away: nothing
    r = detect_hover(5.0, 5.0, quads, CAMPOS, BASIS, W, H)
    assert r.kind is None


def test_depth_priority_tolerance():
    # a big far quad and a small near quad; mouse over the near quad's face
    far = quad_at(20.0, size=30.0)
    near = quad_at(2.0, size=2.0)
    mx, my = screen_of(near.mean(axis=0) + np.float32([0.3, 0.2, 0]))
    r = detect_hover(mx, my, [("far", far), ("near", near)],
                     CAMPOS, BASIS, W, H)
    assert r.kind == "face" and r.tag == "near"
    # near face beats the far quad's vertex when depths differ a lot:
    # put a far vertex directly under the cursor
    far_v = quad_at(20.0, size=2.0, cx=0.3, cy=0.2)
    off = np.float32([0.3 - 1.0, 0.2 - 1.0, 0])  # corner 0 at (−0.7,−0.8)
    mx, my = screen_of(far_v[0])
    r = detect_hover(mx, my, [("farv", far_v), ("near", quad_at(2.0, 4.0))],
                     CAMPOS, BASIS, W, H)
    # depths differ >1%: strict depth order, the near FACE wins
    assert r.kind == "face" and r.tag == "near"


def test_object_hover():
    objs = [("a", np.array([0.0, 0.0, 5.0], np.float32)),
            ("b", np.array([0.4, 0.0, 5.0], np.float32))]
    mx, my = screen_of(objs[1][1])
    hit = detect_object_hover(mx + 2.0, my, objs, CAMPOS, BASIS, W, H)
    assert hit is not None and hit[0] == "b"
    assert detect_object_hover(3.0, 3.0, objs, CAMPOS, BASIS, W, H) is None