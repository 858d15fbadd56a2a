"""Live viewer server tests (in-process HTTP against a running Engine)."""

import json
import time
import urllib.request

import numpy as np

import jax.numpy as jnp

from fluidsim_tpu.config import SimConfig
from fluidsim_tpu.engine import Engine
from fluidsim_tpu.render.live import LiveServer


def make_server(store=None, **live_kw):
    cfg = SimConfig(
        size=32, time_step=0.05, enable_custom_source=True,
        source_strength=60.0, source_radius=2.0, source_position=(0.3, 0.5),
        enable_obstacle=False, obstacle_position=(0.5, 0.5),
        # keep jit compile short so the test's HTTP timeouts are safe
        jacobi_iters=4, double_diffuse=False,
    )
    eng = Engine(cfg, store=store)
    srv = LiveServer(eng, port=0, steps_per_frame=1, poll_ms=30, **live_kw)
    srv.start()
    return srv


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status


def test_live_server_end_to_end():
    srv = make_server()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        status, page = _get(base + "/")
        assert status == 200 and b"canvas" in page

        # sim advances in the background
        t0 = time.time()
        while int(srv.engine.state.step) < 3 and time.time() - t0 < 30:
            time.sleep(0.1)
        assert int(srv.engine.state.step) >= 3

        status, png = _get(base + "/frame.png")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

        # drag event stirs the fluid (FluidSim.cs:414-436 math)
        v_before = float(jnp.abs(srv.engine.state.velocity).max())
        assert _post(base + "/event",
                     {"type": "drag", "prev": [8, 16], "cur": [14, 16]}) == 200
        v_after = float(jnp.abs(srv.engine.state.velocity).max())
        assert v_after > v_before

        # shift-drag repositions the emitter
        assert _post(base + "/event",
                     {"type": "source", "pos": [16.0, 24.0]}) == 200
        assert srv.engine.get_source_position() == (16.0, 24.0)

        # pause stops stepping
        assert _post(base + "/event", {"type": "pause", "paused": True}) == 200
        time.sleep(0.3)
        s1 = int(srv.engine.state.step)
        time.sleep(0.5)
        assert int(srv.engine.state.step) == s1
    finally:
        srv.stop()


def test_live_save_config(tmp_path):
    """'s' = the menu's Save button (MainMenuEvents.cs:80-100): a
    SimulationRuns row when a store is attached, a JSON config otherwise."""
    from fluidsim_tpu.io.checkpoint import load_config
    from fluidsim_tpu.metrics import MetricsStore

    out = str(tmp_path / "cfg.json")
    srv = make_server(config_out=out)
    try:
        assert _post(f"http://127.0.0.1:{srv.port}/event",
                     {"type": "save"}) == 200
        cfg = load_config(out)
        assert cfg.size == srv.engine.cfg.size
    finally:
        srv.stop()

    db = str(tmp_path / "m.db")
    with MetricsStore(db) as store:
        srv = make_server(store=store)
        try:
            assert _post(f"http://127.0.0.1:{srv.port}/event",
                         {"type": "save"}) == 200
            runs = store._conn.execute(
                "SELECT COUNT(*) FROM SimulationRuns").fetchone()[0]
            assert runs >= 2  # engine-start row + saved row
        finally:
            srv.stop()


def test_live_menu_overlay_and_quit():
    """The Esc-toggled menu overlay (MainMenu.uxml:6-8 analog) ships in
    the served page, and its Quit button's event stops the sim loop and
    the HTTP server (MainMenuEvents.cs:54-79)."""
    srv = make_server()
    base = f"http://127.0.0.1:{srv.port}"
    _, page = _get(base + "/")
    # The three menu buttons and the Esc toggle are present in the page.
    for needle in (b'id="menu"', b'id="enter"', b'id="quit"',
                   b'id="save"', b"Escape", b"Main Menu"):
        assert needle in page

    assert _post(base + "/event", {"type": "quit"}) == 200
    t0 = time.time()
    while srv._running and time.time() - t0 < 10:
        time.sleep(0.05)
    assert not srv._running
    srv._sim_thread.join(timeout=10)
    assert not srv._sim_thread.is_alive()
    # The HTTP server is down: a new request must fail.
    import urllib.error

    time.sleep(0.2)
    try:
        _get(base + "/frame.png")
        served_after_quit = True
    except (urllib.error.URLError, ConnectionError, OSError):
        served_after_quit = False
    assert not served_after_quit
