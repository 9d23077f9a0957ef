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


# ---------------------------------------------------------------------------
# Source|User mode + user grid (texture_palette.rs:59-110)
# ---------------------------------------------------------------------------

import numpy as np

from bonnie32_tpu.editor.texture_palette import (TexturePalette,
                                                 draw_mode_toggle,
                                                 draw_user_grid)
from bonnie32_tpu.models.user_texture import UserTexture


def _user_tex(i, name):
    return UserTexture(id=i, name=name, width=8, height=8, depth=0,
                       indices=np.arange(64, dtype=np.uint8) % 4,
                       palette=[0, 0x1F, 0x3E0, 0x7C00])


def test_mode_toggle_flips_user_mode():
    pal = TexturePalette()
    ctx = UiContext()
    r = Rect(0, 0, 100, 16)
    ctx.begin_frame(75, 8, True)          # click "User"
    draw_mode_toggle(ctx, r, pal)
    assert pal.user_mode is True
    ctx.begin_frame(0, 0, False)
    ctx.begin_frame(25, 8, True)          # back to "Source"
    draw_mode_toggle(ctx, r, pal)
    assert pal.user_mode is False


def test_user_grid_apply_and_actions():
    state = _state()
    state.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                                face=SectorFace(kind="floor"))
    pal = TexturePalette()
    texs = [_user_tex(1, "bricks"), _user_tex(2, "moss")]
    rect = Rect(0, 0, 160, 200)
    ctx = UiContext()
    # click the New button
    ctx.begin_frame(10, 10, True)
    assert draw_user_grid(ctx, state, rect, pal, texs) == "new"
    # click the first thumbnail (grid starts at y=22)
    ctx.begin_frame(0, 0, False)
    ctx.begin_frame(10, 30, True)
    draw_user_grid(ctx, state, rect, pal, texs)
    ctx.begin_frame(10, 30, False)
    draw_user_grid(ctx, state, rect, pal, texs)
    assert pal.selected is not None and pal.selected.is_user_texture
    assert pal.selected.name == "bricks"
    floor = state.level.rooms[0].get_sector(1, 1).floor
    assert floor.texture == pal.selected
    # right-click requests the paint editor
    ctx.begin_frame(10, 30, False, right_down=True)
    assert draw_user_grid(ctx, state, rect, pal, texs) == "edit:bricks"


def test_user_texture_renders_in_level():
    # a floor painted with a TextureRef.user resolves through the combined
    # texture list (main.rs:495-507) and renders its texels
    import jax.numpy as jnp

    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import texture_pack as tp
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu.types import CameraArrays
    from bonnie32_tpu.models import build

    state = _state()
    room = state.level.rooms[0]
    ut = _user_tex(1, "bricks")
    room.get_sector(1, 1).floor.texture = TextureRef.user("bricks")

    textures = tp.with_user_textures(_pack(), [ut])
    resolve = tp.make_resolver(textures)
    assert resolve(TextureRef.user("bricks")) is not None
    scene = scene_mod.compile_level(state.level, textures, resolve)
    cam = CameraArrays(
        position=jnp.asarray([1536.0, 2500.0, 1400.0], jnp.float32),
        basis=jnp.asarray(build.camera_basis(1.2, 0.0), jnp.float32))
    fb = raster_ref.new_framebuffer(120, 160, depth_mode="inv")
    fb = scene_mod.render_level(fb, scene, cam, RasterSettings.game())
    assert int((np.asarray(fb.color) != 0).sum()) > 200
