"""Immediate-mode UI toolkit (headless).

The reference builds its editor chrome with an immediate-mode toolkit over
macroquad (`/root/reference/src/ui/` — Rect rect.rs:5, panels panel.rs,
widgets widgets.rs, theme theme.rs, drag state machine drag_tracker.rs).
This build's equivalent is display-agnostic: layout + interaction logic are
pure host code driven by a virtual mouse/keyboard, and painting goes
through ops/draw2d into the same framebuffers the rasterizer writes — so
editor overlays and panels composite with rendered viewports.
"""

from .rect import Rect
from .theme import Theme, DEFAULT_THEME
from .context import MouseState, UiContext
from .widgets import (button, checkbox, drag_value, label_row, slider,
                      tab_bar, toolbar, vlist,
                      DropdownState, begin_dropdown, dropdown,
                      dropdown_block_clicks, dropdown_item,
                      dropdown_menu_rect, dropdown_trigger,
                      ps1_color_picker, ps1_color_picker_height,
                      ps1_color_picker_with_alpha,
                      ps1_color_picker_with_alpha_height,
                      ps1_color_picker_with_blend_mode,
                      ps1_color_picker_with_blend_mode_height,
                      three_way_toggle, PS1_PRESETS)
from .drag_tracker import DragConfig, DragState
from .panel import (SplitDir, SplitPanel, draw_panel, panel_content_rect,
                    draw_collapsible_panel, COLLAPSED_PANEL_HEIGHT)
from .text_input import TextInputState, draw_text_input, x_to_char_index
from .tool import (DragAcceptResult, InputState, ModifierKeys, MouseButtons,
                   Tool, ToolBox, ToolController, ToolRegistry)
from . import font
from . import icons

__all__ = ["Rect", "Theme", "DEFAULT_THEME", "UiContext", "MouseState",
           "button", "checkbox", "slider", "drag_value", "vlist",
           "label_row", "tab_bar", "toolbar", "DragState", "DragConfig",
           "SplitDir", "SplitPanel", "draw_panel", "panel_content_rect",
           "draw_collapsible_panel", "COLLAPSED_PANEL_HEIGHT", "font",
           "TextInputState", "draw_text_input", "x_to_char_index",
           "Tool", "ToolRegistry", "ToolBox", "ToolController",
           "InputState", "ModifierKeys", "MouseButtons",
           "DragAcceptResult", "icons"]
