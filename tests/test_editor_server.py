"""EditorShell HTTP API: the interactive editor's full surface driven
through real HTTP requests against a live session (the same path a
browser takes). Covers view frames, knob edits through the flat host
API with tier routing, the graph editor endpoints, presets, settings,
freeze, and the served app's internal consistency."""

import json
import re
import time
import urllib.request

import numpy as np
import pytest

from signalizer_tpu.editor import EditorShell
from signalizer_tpu.editor.static import INDEX_HTML
from signalizer_tpu.engine import SignalizerEngine
from signalizer_tpu.session import AnalysisSession
from signalizer_tpu.stream.audio_stream import Playhead

FS = 48_000.0


@pytest.fixture(scope="module")
def shell():
    eng = SignalizerEngine("ed-main")
    side = SignalizerEngine("ed-side")
    sess = AnalysisSession(eng, axis_points=128, pixels=128, cursor_fraction=0.5)
    state = {"t": 0}

    def src(n):
        i = np.arange(state["t"], state["t"] + n)
        state["t"] += n
        x = (0.5 * np.sin(2 * np.pi * 1000 * i / FS)).astype(np.float32)
        return np.stack([x, 0.7 * x])

    sh = EditorShell(sess, source=src, playhead=Playhead(bpm=120.0, is_playing=True))
    # fast ticks so tests don't wait
    eng.editor_settings.refresh_rate_ms = 30.0
    sh.start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if json.loads(_raw_get(sh, "/api/state"))["ticks"] >= 3:
            break
        time.sleep(0.1)
    yield sh, eng, sess, side
    sh.stop()
    sess.close()
    eng.close()
    side.close()


def _raw_get(sh, path):
    with urllib.request.urlopen(sh.url.rstrip("/") + path, timeout=30) as r:
        return r.read()


def get(sh, path):
    return json.loads(_raw_get(sh, path))


def post(sh, path, body, headers=None):
    req = urllib.request.Request(
        sh.url.rstrip("/") + path,
        data=json.dumps(body).encode(),
        method="POST",
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _wait(pred, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_state_and_ticking(shell):
    sh, eng, sess, _ = shell
    s = get(sh, "/api/state")
    assert s["tabs"] == [
        "spectrum", "oscilloscope", "vectorscope", "spectrogram", "graph", "global",
    ]
    assert s["engine"] == "ed-main"
    t0 = s["ticks"]
    assert _wait(lambda: get(sh, "/api/state")["ticks"] > t0)


def test_layouts_serve_all_views(shell):
    sh = shell[0]
    for view in ("spectrum", "oscilloscope", "vectorscope", "spectrogram"):
        lay = get(sh, f"/api/layout/{view}")
        assert lay["pages"], view
        assert lay["set"] in ("Spectrum", "Oscilloscope", "Vectorscope")


def test_frame_payloads(shell):
    sh = shell[0]
    assert _wait(lambda: get(sh, "/api/frame/spectrum").get("strips"))
    f = get(sh, "/api/frame/spectrum")
    assert len(f["strips"][0]["y"]) == 128
    assert f["grid"] and f["db_grid"]
    fo = get(sh, "/api/frame/oscilloscope")
    assert fo["shape"][2] == 128 and "colours_u8" in fo
    fv = get(sh, "/api/frame/vectorscope")
    assert len(fv["balance"][0]) == 2
    fs_ = get(sh, "/api/frame/spectrogram")
    assert fs_["height"] > 0


def test_spectrogram_png(shell):
    sh = shell[0]
    png = _raw_get(sh, "/api/spectrogram.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    import zlib, struct

    w, h = struct.unpack(">II", png[16:24])
    assert w > 0 and h > 0
    # IDAT inflates to h rows of 1 + w*4 bytes
    idat = png[png.find(b"IDAT") + 4:png.find(b"IEND") - 4]
    assert len(zlib.decompress(idat)) == h * (1 + w * 4)


def test_param_edit_rides_host_api_and_rebuilds(shell):
    sh, eng, sess, _ = shell
    events = []

    class Host:
        def transmit_change(self, i, v):
            events.append(("change", i, v))

        def begin_gesture(self, i):
            events.append(("begin", i))

        def end_gesture(self, i):
            events.append(("end", i))

    eng.set_automation_host(Host())
    try:
        r = post(sh, "/api/param",
                 {"set": "Spectrum", "name": "WindowSize", "normalized": 0.25})
        assert r["tier"] == "rebuild"
        assert ("begin", [e[1] for e in events if e[0] == "begin"][0]) in events
        assert any(e[0] == "change" for e in events)
        # the rebuild is applied by the tick thread
        assert _wait(
            lambda: sess.processor("spectrum").constant.window_size
            == int(round(eng.spectrum.window_size.get_transformed()))
        )
    finally:
        eng.set_automation_host(None)


def test_param_text_entry(shell):
    sh, eng = shell[0], shell[1]
    r = post(sh, "/api/param",
             {"set": "Spectrum", "name": "LowerBound", "text": "-60 dB"})
    assert "error" not in r
    assert abs(eng.spectrum.low_dbs.get_transformed() - (-60.0)) < 1e-6
    r2 = post(sh, "/api/param",
              {"set": "Spectrum", "name": "LowerBound", "text": "garbage"})
    assert r2["error"] == "unparseable"


def test_colour_edit_is_feed_tier_and_applies(shell):
    sh, eng = shell[0], shell[1]
    r = post(sh, "/api/param", {"set": "Spectrum", "name": "Grid.R", "normalized": 0.9})
    assert r["tier"] == "feed"
    assert abs(eng.spectrum.grid_colour.get_rgba()[0] - 0.9) < 1e-6


def test_unknown_param_is_an_error(shell):
    sh = shell[0]
    assert "error" in post(sh, "/api/param",
                           {"set": "Spectrum", "name": "NoSuchKnob", "normalized": 0.5})
    assert "error" in post(sh, "/api/param",
                           {"set": "NoSuchSet", "name": "WindowSize", "normalized": 0.5})


def test_graph_endpoints(shell):
    sh, eng, _, side = shell
    g = get(sh, "/api/graph")
    names = {n["name"] for n in g["nodes"]}
    assert "ed-main" in names and "ed-side" in names
    sid = next(n["id"] for n in g["nodes"] if n["name"] == "ed-side")
    r = post(sh, "/api/graph/connect", {"src": sid, "src_ch": 0, "dst_ch": 1})
    assert r["ok"]
    assert any(e["src"] == sid and e["dst_ch"] == 1 for e in r["edges"])
    r2 = post(sh, "/api/graph/connect",
              {"src": sid, "src_ch": 0, "dst_ch": 1, "disconnect": True})
    assert r2["ok"]
    assert not any(e["src"] == sid and e["dst_ch"] == 1 for e in r2["edges"])
    r3 = post(sh, "/api/graph/rename", {"name": "renamed-main"})
    assert any(n["name"] == "renamed-main" for n in r3["nodes"])
    post(sh, "/api/graph/rename", {"name": "ed-main"})


def test_presets_roundtrip(shell, tmp_path):
    sh, eng = shell[0], shell[1]
    eng.presets = type(eng.presets)(str(tmp_path))
    eng.spectrum.window_size.set_normalized(0.77)
    r = post(sh, "/api/presets/save", {"name": "editor-test"})
    assert "editor-test" in r["presets"]
    eng.spectrum.window_size.set_normalized(0.11)
    assert post(sh, "/api/presets/load", {"name": "editor-test"})["ok"]
    assert abs(eng.spectrum.window_size.get_normalized() - 0.77) < 1e-9


def test_preset_name_traversal_rejected(shell, tmp_path):
    """Client-supplied preset names must not escape the preset directory
    (advisor finding: '../../x' reached Path joins unsanitized)."""
    sh, eng = shell[0], shell[1]
    eng.presets = type(eng.presets)(str(tmp_path))
    for evil in ("../escape", "..", "a/b", "..\\win", ""):
        r = post(sh, "/api/presets/save", {"name": evil})
        assert "error" in r, evil
        # nothing written outside (or inside) the preset dir
        assert list(tmp_path.parent.glob("*.sgz")) == []
    # loads with traversal names must not read arbitrary .sgz paths
    outside = tmp_path.parent / "secret.sgz"
    outside.write_bytes(b"{}")
    assert post(sh, "/api/presets/load", {"name": "../secret"})["ok"] is False


def test_post_requires_json_content_type(shell):
    """No-preflight browser POSTs (text/plain, form-encoded) are refused:
    the localhost-CSRF gate (advisor finding)."""
    import urllib.error

    sh = shell[0]
    req = urllib.request.Request(
        sh.url.rstrip("/") + "/api/freeze",
        data=json.dumps({"freeze": True}).encode(),
        method="POST",
        headers={"Content-Type": "text/plain"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 415
    assert get(sh, "/api/state")["freeze"] is False


def test_post_rejects_foreign_origin(shell):
    """A cross-site Origin is refused even with a JSON Content-Type
    (covers DNS-rebinding, where the request is same-origin to the
    attacker's hostname)."""
    import urllib.error

    sh = shell[0]
    with pytest.raises(urllib.error.HTTPError) as ei:
        post(sh, "/api/freeze", {"freeze": True},
             headers={"Origin": "http://evil.example:1234"})
    assert ei.value.code == 403
    with pytest.raises(urllib.error.HTTPError):
        post(sh, "/api/freeze", {"freeze": True}, headers={"Origin": "null"})
    # the app's own origin passes
    host, port = sh._server.server_address[:2]
    r = post(sh, "/api/freeze", {"freeze": False},
             headers={"Origin": f"http://{host}:{port}"})
    assert r["freeze"] is False


def test_graph_serialization_control(shell):
    """The preset-graph-saving drop-down (ref: CHANGELOG 0.4.2) drives
    HostGraph.serialization_control through /api/settings."""
    from signalizer_tpu.stream.host_graph import SerializationControl

    sh, eng = shell[0], shell[1]
    try:
        s = post(sh, "/api/settings", {"graph_serialization": 2})
        assert s["graph_serialization"] == 2
        assert eng.host_graph.serialization_control == SerializationControl.IGNORE_ALWAYS
    finally:
        post(sh, "/api/settings", {"graph_serialization": 0})
    assert eng.host_graph.serialization_control == SerializationControl.FULL


def test_exception_log_reveal(shell, tmp_path):
    """The global-settings 'reveal exception log' affordance (ref:
    CHANGELOG 0.4.2): the endpoint serves the pruned log's tail."""
    from signalizer_tpu.utils import exception_log as xl

    sh = shell[0]
    old = xl.get_exception_log_path()
    xl.set_exception_log_path(tmp_path / "exceptions.log")
    try:
        xl.log_exception("editor-reveal-test marker")
        r = get(sh, "/api/exceptions")
        assert r["path"].endswith("exceptions.log")
        assert r["size_bytes"] > 0
        assert "editor-reveal-test marker" in r["tail"]
    finally:
        xl.set_exception_log_path(old)


def test_freeze_and_settings(shell):
    sh, eng, sess, _ = shell
    try:
        assert post(sh, "/api/freeze", {"freeze": True})["freeze"] is True
        assert sess.freeze is True
    finally:
        post(sh, "/api/freeze", {"freeze": False})
    s = post(sh, "/api/settings", {"refresh_rate_ms": 55.0, "hide_tabs": False})
    assert s["refresh_rate_ms"] == 55.0 and s["hide_tabs"] is False
    assert eng.editor_settings.refresh_rate_ms == 55.0
    s2 = post(sh, "/api/settings",
              {"colour": {"name": "Normal", "rgba": [0.1, 0.2, 0.3, 1.0]}})
    assert s2["colour_scheme"]["Normal"] == [0.1, 0.2, 0.3, 1.0]
    post(sh, "/api/settings", {"refresh_rate_ms": 30.0, "hide_tabs": True})


def test_cursor_drives_tracker(shell):
    sh, eng, sess, _ = shell
    # FTracker = graph 0 (index 1 of [none, graph0, graph1-ish...]) — use
    # the transform source which always exists
    eng.spectrum.frequency_tracker.set_normalized(1 / 3.0)
    sess.refresh_feeds()
    post(sh, "/api/cursor", {"fraction": 1000.0 * 2 / FS})
    try:
        assert _wait(
            lambda: (get(sh, "/api/frame/spectrum").get("tracker") or {}).get(
                "frequency", 0.0
            )
            > 0.0
        )
    finally:
        eng.spectrum.frequency_tracker.set_normalized(0.0)
        sess.refresh_feeds()


def test_served_html_is_internally_consistent():
    """No JS runtime ships in this rig, so pin the app statically: every
    endpoint the page calls must exist in the server, every element id
    the script queries must exist in the markup, and the script block is
    balanced."""
    from signalizer_tpu.editor import server as srv
    import inspect

    server_src = inspect.getsource(srv)
    for path in set(re.findall(r"\"(/api/[a-z.\-/]+)", INDEX_HTML)):
        assert path in server_src, f"page calls {path} but the server lacks it"
    for el_id in set(re.findall(r'\$\("#([a-z]+)"\)', INDEX_HTML)):
        assert (f'id="{el_id}"' in INDEX_HTML) or (
            f'id = "{el_id}"' in INDEX_HTML
        ) or (f'status.id = "{el_id}"' in INDEX_HTML) or (
            f'd.id = "{el_id}"' in INDEX_HTML
        ), f"script queries #{el_id} but no element carries it"
    script = INDEX_HTML[INDEX_HTML.find("<script>"):INDEX_HTML.find("</script>")]
    for open_c, close_c in (("{", "}"), ("(", ")"), ("[", "]")):
        # strings can unbalance braces; strip string literals first
        stripped = re.sub(r'"(?:[^"\\]|\\.)*"', "", script)
        assert stripped.count(open_c) == stripped.count(close_c), open_c


def test_png_encoder_roundtrip():
    from signalizer_tpu.utils.png import encode_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (17, 23, 4), np.uint8)
    png = encode_png(img)
    import matplotlib

    matplotlib.use("Agg")
    import io
    import matplotlib.image as mpimg

    back = (mpimg.imread(io.BytesIO(png), format="png") * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back, img)


def test_feed_edit_survives_unrelated_rebuild():
    """A queued feed-tier edit must not be swallowed by a pending rebuild
    of a DIFFERENT view arriving in the same tick (regression: round-3
    review found _apply_pending skipped refresh_feeds whenever ANY
    rebuild was pending)."""
    eng = SignalizerEngine("ed-feedfix")
    sess = AnalysisSession(eng, axis_points=128, pixels=128, cursor_fraction=0.5)
    try:
        sh = EditorShell(sess)  # not started: drive _apply_pending directly
        calls = []
        sess.refresh_feeds = lambda: calls.append("feeds")  # record only
        sh._pending_feeds = True
        sh._pending_rebuild = {"oscilloscope"}
        sh._apply_pending()
        assert calls == ["feeds"]
        # ...but a SPECTRUM rebuild already rebuilds the feeds itself —
        # no redundant refresh then
        calls.clear()
        sh._pending_feeds = True
        sh._pending_rebuild = {"spectrum"}
        sh._apply_pending()
        assert calls == []
    finally:
        sess.close()
        eng.close()


def test_presentation_clock_advances_under_shell_feed(shell):
    """The shell's per-block playhead must advance with the audio: a
    frozen steady_clock made the mix graph drop every block after the
    first as a full overlap, freezing the presentation stream at block
    one (round-3 review, reproduced empirically)."""
    sh, eng = shell[0], shell[1]
    c0 = eng.presentation_output.sample_clock
    deadline = time.time() + 30
    while time.time() < deadline:
        if eng.presentation_output.sample_clock > c0 + 4096:
            break
        time.sleep(0.1)
    assert eng.presentation_output.sample_clock > c0 + 4096
