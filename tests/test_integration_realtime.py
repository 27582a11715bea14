"""Realtime-simulation integration: one engine, all four views, many blocks.

Simulates a DAW session: audio arrives in small blocks with a moving
playhead; every "render tick" all views consume the presentation stream.
Checks cross-view consistency and that nothing drifts, leaks or NaNs over
a sustained run (the class of bug the reference's CHANGELOG kept fixing).
"""

import numpy as np
import pytest

from signalizer_tpu.engine import SignalizerEngine
from signalizer_tpu.stream.audio_stream import Playhead
from signalizer_tpu.stream.host_graph import HostGraph
from signalizer_tpu.views.spectrogram import ColumnPacer

FS = 48_000.0


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for node in HostGraph.live_nodes():
        node.close()
    HostGraph._alias_chains.clear()


def test_sustained_session_all_views():
    eng = SignalizerEngine("session")
    eng.spectrum.channel_configuration.set_transformed(0)  # left
    eng.spectrum.view_scaling.set_transformed(0)  # linear axis
    eng.spectrum.window_size.set_transformed(2048)
    eng.oscilloscope.trigger_mode.set_transformed(4)  # zero crossing
    eng.oscilloscope.trigger_threshold.set_transformed(0.1)
    # short meter windows so the bars converge within the session
    # (the parameter is normalized: pole = exp(-1/(norm * fs)))
    eng.vectorscope.stereo_window.set_normalized(0.02)
    eng.vectorscope.envelope_window.set_normalized(0.02)

    spec = eng.make_spectrum_processor(axis_points=257)
    osc = eng.make_oscilloscope_processor(pixels=256)
    vs = eng.make_vectorscope_processor()
    sg = eng.make_spectrogram_processor(axis_points=64, image_width=64)
    pacer = ColumnPacer()

    f_hz = 1500.0
    block = 480  # 10 ms blocks
    phase = 0.0
    playhead = Playhead(is_playing=True)
    peak_px_votes = []
    for tick in range(30):
        # ~2 blocks per render tick
        for _ in range(2):
            t = (np.arange(block) + phase) / FS
            x = (0.8 * np.sin(2 * np.pi * f_hz * t)).astype(np.float32)
            stereo = np.stack([x, 0.5 * x])
            eng.process_block(stereo, playhead)
            sg.push(stereo)
            playhead = playhead.advanced(block)
            phase += block

        hist = eng.get_presentation_history(2048)[None]
        row = np.asarray(spec.process(hist))[0, 0, 0, 0]
        assert np.all(np.isfinite(row))
        peak_px_votes.append(int(np.argmax(row)))

        frame = osc.process(eng.get_presentation_history(16384)[None])
        assert np.all(np.isfinite(np.asarray(frame.waveform)))

        out = vs.process(eng.get_presentation_history(1024)[None])
        assert np.all(np.isfinite(np.asarray(out.vertices)))

        cols = sg.pull()
        take = pacer.columns_for_tick(cols.shape[0])
        assert 0 <= take <= cols.shape[0]

    # spectrum: stable peak at 1500 Hz (pixel 16 of 257 over 0..24k)
    votes = np.bincount(peak_px_votes)
    assert abs(int(np.argmax(votes)) - 16) <= 1
    # vectorscope: 0.5x right of identical content -> strong correlation,
    # balance tilted left
    bal = float(np.asarray(out.balance)[0, 1])
    corr = float(np.asarray(out.correlation_bars)[0, 1])
    assert corr > 0.85
    assert bal < 0.45
    # oscilloscope: trigger found and locked
    assert bool(np.asarray(frame.trigger_found)[0])
    # stream health
    perf = eng.perf_snapshot()
    assert perf["mix_synchronized"] == 1.0
    assert perf["stream_dropped_frames"] == 0
    # diagnostics-HUD percentages exist and look like fractions of the
    # real-time budget (ref HUD row: usage AND overhead)
    for key in (
        "stream_producer_usage",
        "stream_producer_overhead",
        "stream_consumer_usage",
        "stream_consumer_overhead",
    ):
        assert perf[key] >= 0.0, key
    assert perf["stream_producer_usage"] > 0.0  # audio was ingested
    assert sg.batcher.dropped_frames == 0
    eng.close()
