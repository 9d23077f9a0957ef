"""Checkpoint/resume of batched rollout state + tab bar/toolbar widgets."""

import numpy as np
import jax
import jax.numpy as jnp

from bonnie32_tpu import checkpoint as ckpt
from bonnie32_tpu.game import state as st
from bonnie32_tpu.game import events as ev


def batched_states(n=4, cap=8):
    def one(i):
        s = st.new_state(cap)
        s, _ = st.spawn(s, st.KIND_ENEMY, (float(i), 0.0, 0.0), hp=5 + i)
        return s
    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(i) for i in range(4)])


def test_save_restore_roundtrip(tmp_path):
    states = batched_states()
    p = str(tmp_path / "roll.ckpt.npz")
    ckpt.save(p, states, metadata={"frame": 120, "level": "Cave"})

    meta = ckpt.load_metadata(p)
    assert meta["format_version"] == 1
    assert meta["user"]["frame"] == 120

    template = batched_states()  # fresh template, same structure
    restored = ckpt.restore(p, template)
    for a, b in zip(jax.tree.leaves(states), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype


def test_restore_validates(tmp_path):
    states = batched_states()
    p = str(tmp_path / "x.npz")
    ckpt.save(p, states)
    # wrong-capacity template -> shape error
    import pytest
    wrong = jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[st.new_state(16) for _ in range(4)])
    with pytest.raises(ValueError):
        ckpt.restore(p, wrong)
    # different pytree (events) -> missing leaves
    with pytest.raises(ValueError):
        ckpt.restore(p, ev.new_events(4))


def test_bytes_roundtrip():
    evs = ev.new_events(4)
    evs = evs._replace(damage=ev.push(evs.damage, a=3, c=9))
    blob = ckpt.save_bytes(evs, metadata={"k": 1})
    back = ckpt.restore_bytes(blob, ev.new_events(4))
    assert int(back.damage.count) == 1 and int(back.damage.a[0]) == 3


def test_tab_bar_and_toolbar():
    from bonnie32_tpu.ui import Rect, UiContext, tab_bar, toolbar
    ctx = UiContext()
    r = Rect(0, 0, 300, 24)
    labels = ["Home", "World", "Test"]
    ctx.begin_frame(150, 10, True)        # over tab 1
    active = tab_bar(ctx, "tabs", r, labels, 0)
    ctx.begin_frame(150, 10, False)       # release -> click
    active = tab_bar(ctx, "tabs", r, labels, active)
    assert active == 1

    tb = Rect(0, 30, 200, 24)
    ctx.begin_frame(70, 42, True)         # third button (28px wide)
    sel = toolbar(ctx, "tools", tb, ["S", "F", "W"], 0)
    ctx.begin_frame(70, 42, False)
    sel = toolbar(ctx, "tools", tb, ["S", "F", "W"], sel)
    assert sel == 2