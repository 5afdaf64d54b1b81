"""Headless execution of the interactive GUI (gymgo_tpu.utils.gui).

pyglet isn't installed in CI and there is no display, so a stub pyglet is
injected into sys.modules; the stub's ``app.run`` plays the role of the
event loop: it fires ``on_draw`` once (executing every shape/label code
path) and then injects a synthetic input event.  This executes the REAL
run_game_window end-to-end — window construction, the full draw pass over
a mid-game board, and the click/key handlers' action mapping — mirroring
the reference's blocking-window contract
(/root/reference/gym_go/envs/go_env.py:160-243, rendering.py:7-97).

The stub emulates BOTH pyglet 2.x generations with STRICT constructor
signatures (no **kwargs swallowing), because the two are incompatible in
exactly the ways that would only surface on a live window:
  * "2.0": ``pyglet.canvas.get_display()`` and ``shapes.Line(width=...)``
  * "2.1": ``pyglet.display.get_display()`` (canvas removed) and
    ``shapes.Line(thickness=...)``
run_game_window feature-detects both; every test runs against each.
A wrong keyword raises TypeError just like real pyglet would.
"""

import sys
import types

import numpy as np
import pytest

from gymgo_tpu.utils import gui_math


class _Handlers:
    """Event registry shared between the stub Window and stub app.run."""

    def __init__(self):
        self.fns = {}


def _make_stub_pyglet(handlers, script, version):
    """Build a stub pyglet package emulating a real 2.x generation.
    ``script(handlers)`` runs inside app.run after one draw pass,
    injecting synthetic events."""
    assert version in ("2.0", "2.1")
    pyglet = types.ModuleType("pyglet")

    # display / screen
    class _Screen:
        width, height = 1920, 1080

    class _Display:
        def get_default_screen(self):
            return _Screen()

    display_mod = types.ModuleType(
        "pyglet.canvas" if version == "2.0" else "pyglet.display"
    )
    display_mod.get_display = lambda: _Display()

    # window + key/mouse constant modules
    class _Window:
        CURSOR_CROSSHAIR = "crosshair"

        def __init__(self, width=960, height=540, caption=None):
            self.width, self.height = width, height
            self.closed = False

        def event(self, fn):
            handlers.fns[fn.__name__] = fn
            return fn

        def get_system_mouse_cursor(self, name):
            return name

        def set_mouse_cursor(self, cursor):
            pass

        def clear(self):
            pass

        def close(self):
            self.closed = True

    window_mod = types.ModuleType("pyglet.window")
    window_mod.Window = _Window
    key_mod = types.ModuleType("pyglet.window.key")
    key_mod.P, key_mod.R, key_mod.E = 112, 114, 101
    mouse_mod = types.ModuleType("pyglet.window.mouse")
    mouse_mod.LEFT = 1
    window_mod.key = key_mod
    window_mod.mouse = mouse_mod

    # drawing primitives: record, don't render.  STRICT signatures — the
    # version-specific Line keyword and a closed Label keyword set — so a
    # call real pyglet would reject fails here too.
    drawn = {"shapes": 0, "labels": 0, "batches": 0}

    class _Circle:
        def __init__(self, x, y, radius, segments=None, color=(255, 255, 255),
                     batch=None, group=None):
            drawn["shapes"] += 1

    if version == "2.1":
        class _Line:
            def __init__(self, x, y, x2, y2, thickness=1,
                         color=(255, 255, 255), batch=None, group=None):
                drawn["shapes"] += 1
    else:
        class _Line:
            def __init__(self, x, y, x2, y2, width=1,
                         color=(255, 255, 255), batch=None, group=None):
                drawn["shapes"] += 1

    _LABEL_KW = {
        "font_name", "font_size", "bold", "italic", "color", "x", "y",
        "width", "height", "anchor_x", "anchor_y", "align", "multiline",
        "batch", "group", "dpi", "rotation", "z",
    }

    class _Label:
        def __init__(self, text="", **kw):
            bad = set(kw) - _LABEL_KW
            if bad:
                raise TypeError(f"Label got unexpected kwargs {bad}")
            drawn["labels"] += 1

    class _Batch:
        def draw(self):
            drawn["batches"] += 1

    shapes_mod = types.ModuleType("pyglet.shapes")
    shapes_mod.Circle = _Circle
    shapes_mod.Line = _Line
    text_mod = types.ModuleType("pyglet.text")
    text_mod.Label = _Label
    graphics_mod = types.ModuleType("pyglet.graphics")
    graphics_mod.Batch = _Batch
    gl_mod = types.ModuleType("pyglet.gl")
    gl_mod.glClearColor = lambda *a: None

    app_mod = types.ModuleType("pyglet.app")

    def _run():
        handlers.fns["on_draw"]()  # full draw pass
        script(handlers)

    app_mod.run = _run
    app_mod.exit = lambda: None

    if version == "2.0":
        pyglet.canvas = display_mod
    else:
        pyglet.display = display_mod  # 2.1: no pyglet.canvas at all
    pyglet.window = window_mod
    pyglet.shapes = shapes_mod
    pyglet.text = text_mod
    pyglet.graphics = graphics_mod
    pyglet.gl = gl_mod
    pyglet.app = app_mod
    pyglet._drawn = drawn

    mods = {
        "pyglet": pyglet,
        ("pyglet.canvas" if version == "2.0" else "pyglet.display"):
            display_mod,
        "pyglet.window": window_mod,
        "pyglet.window.key": key_mod,
        "pyglet.window.mouse": mouse_mod,
        "pyglet.shapes": shapes_mod,
        "pyglet.text": text_mod,
        "pyglet.graphics": graphics_mod,
        "pyglet.gl": gl_mod,
        "pyglet.app": app_mod,
    }
    return pyglet, mods


@pytest.fixture
def midgame_env():
    from gymgo_tpu.env.go_env import GoEnv

    env = GoEnv(size=7, backend="jax")
    env.reset()
    for mv in [(3, 3), (2, 2), (3, 4), (2, 3), (1, 1)]:
        env.step(mv)
    return env


def _run_gui(monkeypatch, env, script, version):
    handlers = _Handlers()
    pyglet, mods = _make_stub_pyglet(handlers, script, version)
    monkeypatch.setitem(sys.modules, "pyglet.canvas", None)
    monkeypatch.setitem(sys.modules, "pyglet.display", None)
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    from gymgo_tpu.utils import gui

    action = gui.run_game_window(env)
    return action, pyglet._drawn


VERSIONS = ["2.0", "2.1"]


@pytest.mark.parametrize("version", VERSIONS)
def test_click_returns_board_action(monkeypatch, midgame_env, version):
    """A synthetic LEFT click at the screen position of intersection (4, 5)
    comes back as the (4, 5) action, through the REAL window code."""
    size = midgame_env.size
    lay = gui_math.board_layout(1920, 1080, size)

    def script(handlers):
        x, y = gui_math.stone_screen_pos(4, 5, lay.lower_grid_coord, lay.delta)
        handlers.fns["on_mouse_press"](x, y, 1, 0)  # mouse.LEFT

    action, drawn = _run_gui(monkeypatch, midgame_env, script, version)
    assert tuple(np.asarray(action)) == (4, 5)
    # the draw pass really ran: grid lines + 5 stones + labels + batch.draw
    assert drawn["batches"] == 1
    assert drawn["shapes"] >= 2 * midgame_env.size + 5
    assert drawn["labels"] >= 2 * midgame_env.size + 4


@pytest.mark.parametrize("version", VERSIONS)
def test_pass_reset_exit_keys(monkeypatch, midgame_env, version):
    """P returns None (pass), E returns -1 (exit), R resets the env —
    go_env.py:226-243 key contract."""

    def press(sym):
        def script(handlers):
            handlers.fns["on_key_press"](sym, 0)

        return script

    action, _ = _run_gui(monkeypatch, midgame_env, press(112), version)  # P
    assert action is None

    action, _ = _run_gui(monkeypatch, midgame_env, press(101), version)  # E
    assert action == -1

    stones_before = int(np.sum(midgame_env.state()[[0, 1]]))
    assert stones_before == 5
    _run_gui(monkeypatch, midgame_env, press(114), version)  # R
    assert int(np.sum(midgame_env.state()[[0, 1]])) == 0


@pytest.mark.parametrize("version", VERSIONS)
def test_render_human_routes_through_gui(monkeypatch, midgame_env, version):
    """env.render('human') is the documented entry point (go_env.py:160)."""
    handlers = _Handlers()

    def script(h):
        h.fns["on_key_press"](112, 0)  # P -> pass

    pyglet, mods = _make_stub_pyglet(handlers, script, version)
    monkeypatch.setitem(sys.modules, "pyglet.canvas", None)
    monkeypatch.setitem(sys.modules, "pyglet.display", None)
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    assert midgame_env.render("human") is None
