"""Texture palette (texture_palette.rs): thumbnail grid, click-to-apply
with triangle sub-selection, wall stacks, undo snapshot, toast."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.editor.state import (EditorState, SectorFace, Selection,
                                       TriangleSelection)
from bonnie32_tpu.editor import texture_palette as tpal
from bonnie32_tpu.models.level import (NORTH, Level, Room, TextureRef)
from bonnie32_tpu.models.texture_pack import PackTexture
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext


def _pack():
    texs = []
    for i in range(6):
        p = np.full((16, 16), (i + 1) * 0x0842, np.uint16)
        texs.append(PackTexture(f"T{i}", p))
    return texs


def _state():
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 3, 3)
    room.set_floor(1, 1, 0.0, TextureRef("p", "OLD"))
    room.set_ceiling(1, 1, 3072.0, TextureRef("p", "OLD"))
    room.add_wall(1, 1, NORTH, 0.0, 3072.0, TextureRef("p", "OLD"))
    room.recalculate_bounds()
    level.add_room(room)
    return EditorState(level)


def test_thumb_sizes():
    assert tpal.smaller_thumb_size(64.0) == 48.0
    assert tpal.smaller_thumb_size(32.0) == 32.0
    assert tpal.larger_thumb_size(64.0) == 96.0
    assert tpal.larger_thumb_size(128.0) == 128.0


def test_thumbnail_words_expand():
    p = np.full((16, 16), 0x7FFF, np.uint16)   # white
    w = tpal.thumbnail_words(p, 8)
    assert w.shape == (8, 8)
    assert (w & 0xFF == 255).all() and ((w >> 24) & 0xFF == 255).all()


def test_apply_triangle_selection_semantics():
    st = _state()
    floor = st.level.rooms[0].get_sector(1, 1).floor
    t1 = TextureRef("p", "A")
    t2 = TextureRef("p", "B")
    tpal.apply_texture_to_horizontal_face(floor, t1, TriangleSelection.TRI2)
    assert floor.texture.name == "OLD" and floor.texture_2.name == "A"
    tpal.apply_texture_to_horizontal_face(floor, t2, TriangleSelection.TRI1)
    assert floor.texture.name == "B" and floor.texture_2.name == "A"
    tpal.apply_texture_to_horizontal_face(floor, t1, TriangleSelection.BOTH)
    assert floor.texture.name == "A" and floor.texture_2 is None


def test_apply_to_wall_and_whole_sector():
    st = _state()
    sel = Selection(kind="sector_face", room=0, x=1, z=1,
                    face=SectorFace(kind="wall", direction=NORTH,
                                    wall_index=0))
    assert tpal.apply_texture_to_selection(
        st.level, sel, TextureRef("p", "W"), TriangleSelection.BOTH)
    sector = st.level.rooms[0].get_sector(1, 1)
    assert sector.walls(NORTH)[0].texture.name == "W"

    sel2 = Selection(kind="sector", room=0, x=1, z=1)
    assert tpal.apply_texture_to_selection(
        st.level, sel2, TextureRef("p", "ALL"), TriangleSelection.BOTH)
    assert sector.floor.texture.name == "ALL"
    assert sector.ceiling.texture.name == "ALL"
    assert sector.walls(NORTH)[0].texture.name == "ALL"


def test_palette_click_applies_with_undo_and_raster():
    st = _state()
    st.set_selection(Selection(kind="sector_face", room=0, x=1, z=1,
                               face=SectorFace(kind="floor")))
    pal = tpal.TexturePalette(pack_name="p")
    texs = _pack()
    ctx = UiContext()
    rect = Rect(0, 0, 160, 120)

    ctx.begin_frame(0, 0, False)
    pal.draw(ctx, st, rect, texs)
    cells = pal.grid_layout(rect, len(texs))
    cx, cy = cells[2][1].center_x, cells[2][1].center_y

    ctx.begin_frame(cx, cy, True)
    pal.draw(ctx, st, rect, texs)
    ctx.begin_frame(cx, cy, False)
    idx = pal.draw(ctx, st, rect, texs)
    assert idx == 2
    assert pal.selected.name == "T2"
    floor = st.level.rooms[0].get_sector(1, 1).floor
    assert floor.texture.name == "T2"
    assert len(st.undo_stack) == 1
    assert "Applied T2" in st.status_message

    # thumbnails rasterize into the framebuffer
    fb = FrameBuffers(color=jnp.zeros((120, 160), jnp.int32),
                      depth=jnp.zeros((120, 160), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w != 0).mean() > 0.5
