"""Smoke tests for the optional matplotlib viewer."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from signalizer_tpu.views.render import (
    render_oscilloscope,
    render_spectrogram,
    render_spectrum,
    render_vectorscope,
)


def test_render_spectrum(tmp_path):
    f = np.geomspace(10, 24000, 200)
    row = np.random.default_rng(0).random(200)
    out = render_spectrum(row, f, path=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").stat().st_size > 1000


def test_render_vectorscope(tmp_path):
    from signalizer_tpu.views.vectorscope import VectorscopeProcessor

    proc = VectorscopeProcessor(pairs=1)
    frame = proc.process(np.random.default_rng(1).standard_normal((1, 2, 256)).astype(np.float32) * 0.5)
    render_vectorscope(frame, path=str(tmp_path / "v.png"))
    assert (tmp_path / "v.png").stat().st_size > 1000


def test_render_oscilloscope_and_spectrogram(tmp_path):
    from signalizer_tpu.views.oscilloscope import OscilloscopeProcessor
    from signalizer_tpu.views.spectrogram import SpectrogramImage

    proc = OscilloscopeProcessor(pairs=1, pixels=64, window_samples=512.0)
    frame = proc.process(np.zeros((1, 2, 8192), np.float32))
    render_oscilloscope(frame, path=str(tmp_path / "o.png"))
    img = SpectrogramImage(16, 8)
    img.push_columns(np.random.default_rng(2).integers(0, 255, (5, 8, 4)).astype(np.uint8))
    render_spectrogram(img, path=str(tmp_path / "g.png"))
    assert (tmp_path / "o.png").exists() and (tmp_path / "g.png").exists()


def test_line_graph_render_feed_arrays():
    """The vertex feed reproduces the reference's draw list: back-to-front
    k order, 'two' rows at z=-0.5 before 'one' rows at z=0, flood fills at
    flood_fill_alpha, per-pair hue rotation, legend entries
    (ref: SpectrumRendering.cpp:793-897)."""
    import jax.numpy as jnp
    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.views.content import SpectrumContent
    from signalizer_tpu.views.spectrum import SpectrumProcessor

    content = SpectrumContent()
    content.channel_configuration.set_normalized(5 / 7)  # separate
    content.flood_fill_alpha.set_normalized(0.5)
    # a saturated base colour so the per-pair hue rotation is observable
    # (rotating an achromatic colour is a no-op)
    for k in range(2):
        content.lines[k][1].r.set_normalized(0.0)
        content.lines[k][1].g.set_normalized(1.0)
        content.lines[k][1].b.set_normalized(0.0)
    proc = SpectrumProcessor.create(
        pairs=2, axis_points=128, window_size=512,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    rng = np.random.default_rng(0)
    results = proc.process(rng.standard_normal((2, 1, 2, 512)).astype(np.float32))
    feed = content.make_render_feed(proc.constant, pairs=2)
    frame = feed.build(np.asarray(results[:, -1]))

    k, rows, pairs = 2, 2, 2
    assert len(frame.strips) == k * rows * pairs
    assert len(frame.floods) == k * rows * pairs
    # draw order: all k=1 strips (back) before k=0 strips (front)
    assert "second" in frame.strips[0].label and "main" in frame.strips[-1].label
    # 'two' row precedes 'one' row within a (k, pair) group and sits deeper
    assert frame.strips[0].vertices[0, 2] == -0.5
    assert frame.strips[1].vertices[0, 2] == 0.0
    # pairs rotate hue: pair1 colour differs from pair0
    c_pair0 = frame.strips[1].colour
    c_pair1 = frame.strips[3].colour
    assert not np.allclose(c_pair0[:3], c_pair1[:3])
    # flood alpha follows the knob
    assert frame.floods[0].colour[3] == pytest.approx(0.5)
    # vertices carry the actual display values
    s = next(s for s in frame.strips if s.label == "pair0 left main")
    np.testing.assert_allclose(
        s.vertices[:, 1], np.asarray(results)[0, -1, 0, 0, :], atol=1e-6
    )
    assert frame.legend is not None and len(frame.legend.entries) == 8
    # grids are present and normalized
    assert frame.grid and all(0.0 <= g.position <= 1.0 for g in frame.grid)

    # the viewer renders from the arrays alone
    import importlib
    if importlib.util.find_spec("matplotlib"):
        from signalizer_tpu.views.render import render_line_graph_frame
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            out = render_line_graph_frame(frame, path=os.path.join(d, "lg.png"))
            assert os.path.getsize(out) > 0


def test_show_legend_off_and_no_flood():
    from signalizer_tpu.core.config import BinInterpolation, SpectrumChannels, ViewScaling
    from signalizer_tpu.views.content import SpectrumContent
    from signalizer_tpu.views.spectrum import SpectrumProcessor

    content = SpectrumContent()
    content.show_legend.set_normalized(0.0)
    content.flood_fill_alpha.set_normalized(0.0)
    proc = SpectrumProcessor.create(
        pairs=1, axis_points=64, window_size=256,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
    )
    results = proc.process(np.zeros((1, 1, 2, 256), np.float32))
    frame = content.make_render_feed(proc.constant).build(np.asarray(results[:, -1]))
    assert frame.legend is None
    assert frame.floods == []
    assert len(frame.strips) == 2  # K=2 graphs x 1 row


def test_render_hints_flow_from_contents():
    """make_render_hints exposes every view-shell knob; the viewers accept
    them (render path smoke when matplotlib is present)."""
    from signalizer_tpu.views.content import OscilloscopeContent, VectorScopeContent

    oc = OscilloscopeContent()
    oh = oc.make_render_hints()
    for key in ("antialias", "primitive_size", "dot_samples", "overlay_channels",
                "show_legend", "cursor_tracker", "view_box", "graph_colour",
                "background_colour", "widget_colour", "transform",
                "pct_for_division", "diagnostics"):
        assert key in oh, key
    vc = VectorScopeContent()
    vh = vc.make_render_hints()
    for key in ("antialias", "fade_older_points", "interconnect_samples",
                "primitive_size", "show_legend", "waveform_colour", "axis_colour",
                "background_colour", "skeleton_colour", "meter_colour",
                "widget_colour", "transform", "diagnostics"):
        assert key in vh, key

    import importlib
    if importlib.util.find_spec("matplotlib"):
        import os, tempfile
        from signalizer_tpu.views.oscilloscope import OscilloscopeProcessor
        from signalizer_tpu.views.vectorscope import VectorscopeProcessor
        from signalizer_tpu.views.render import render_oscilloscope, render_vectorscope

        oc.overlay_channels.set_normalized(1.0)
        oc.dot_samples.set_normalized(1.0)
        op = OscilloscopeProcessor(pairs=1, pixels=64, window_samples=256.0)
        frame = op.process(np.random.default_rng(0).standard_normal((1, 2, 1024)).astype(np.float32))
        vp = VectorscopeProcessor(pairs=1)
        vframe = vp.process(np.random.default_rng(0).standard_normal((1, 2, 256)).astype(np.float32))
        vc.interconnect_samples.set_normalized(1.0)
        with tempfile.TemporaryDirectory() as d:
            p1 = render_oscilloscope(frame, hints=oc.make_render_hints(), path=os.path.join(d, "o.png"))
            p2 = render_vectorscope(vframe, hints=vc.make_render_hints(), path=os.path.join(d, "v.png"))
            assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_engine_legend_uses_propagated_channel_names():
    """The legend carries the graph-propagated source names "instance:port"
    with per-pair rotated colours (ref: CHANGELOG 0.4.0 legends; names via
    enqueueChannelName on topology application,
    MixGraphListener.cpp:210,236)."""
    import numpy as np

    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.stream.host_graph import PortPair

    a = SignalizerEngine("main-track")
    b = SignalizerEngine("side-chain")
    try:
        a.host_graph.topology[a.host_graph.node_id] = {PortPair(0, 0), PortPair(1, 1)}
        a.host_graph.connect(b.host_graph.node_id, PortPair(0, 1))
        blk = np.zeros((2, 128), np.float32)
        b.process_block(blk)
        a.process_block(blk)  # drains the queued topology commands
        legend = a.make_legend("oscilloscope", pairs=2)
        assert legend.entries[0].name == "main-track:0"
        assert legend.entries[1].name == "side-chain:0"
        assert legend.entries[2].name.startswith("channel")
        # pair 1 colour differs (hue rotation) but pair 0 keeps the base
        assert legend.entries[0].colour != legend.entries[2].colour
    finally:
        a.close()
        b.close()
