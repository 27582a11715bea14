"""AnalysisSession — the MainEditor tick-loop analogue."""

import numpy as np
import pytest

from signalizer_tpu.engine import SignalizerEngine
from signalizer_tpu.session import ALL_VIEWS, AnalysisSession
from signalizer_tpu.stream.audio_stream import Playhead

FS = 48_000.0


def _sine_block(n=4096, f=440.0, phase=0.0):
    t = np.arange(n) / FS
    x = 0.5 * np.sin(2 * np.pi * f * t + phase).astype(np.float32)
    return np.stack([x, 0.8 * x])


def test_session_all_views_tick():
    eng = SignalizerEngine("session")
    eng.spectrum.frequency_tracker.set_normalized(1 / 3)  # FTracker = transform
    s = AnalysisSession(eng, axis_points=256, pixels=128, cursor_fraction=440.0 / (FS / 2))
    for i in range(6):
        s.feed(_sine_block(phase=i), Playhead(steady_clock=i * 4096, bpm=120.0, is_playing=True))
    frame = s.tick()
    assert frame.spectrum is not None and frame.spectrum.shape[-1] == 256
    assert frame.oscilloscope is not None and frame.oscilloscope.waveform.shape[-1] == 128
    assert frame.vectorscope is not None
    assert frame.line_graph is not None and len(frame.line_graph.strips) >= 1
    assert frame.spectrogram_columns is not None
    # the tracker reads out the fed sine
    assert frame.tracker is not None
    assert frame.tracker["frequency"] == pytest.approx(440.0, rel=0.02)
    assert frame.tracker["note"].startswith("A4")
    assert frame.tracker["source"] == "transform"
    assert frame.diagnostics["fps"] >= 0.0
    # second tick carries state (no errors, new_samples = 0 path)
    frame2 = s.tick()
    assert frame2.spectrum is not None
    s.close()


def test_session_subset_and_reconfigure():
    eng = SignalizerEngine("subset")
    s = AnalysisSession(eng, views=("vectorscope",), axis_points=64, pixels=32)
    s.feed(_sine_block())
    frame = s.tick()
    assert frame.vectorscope is not None
    assert frame.spectrum is None and frame.oscilloscope is None
    # knob change + targeted reconfigure (the flag-update analogue)
    eng.vectorscope.operational_mode.set_normalized(1.0)  # polar
    s.reconfigure("vectorscope")
    s.feed(_sine_block())
    frame = s.tick()
    v = np.asarray(frame.vectorscope.vertices)
    assert np.all(v[..., 1] >= -1e-5)  # polar half-plane
    s.close()


def test_session_contains_view_faults():
    """A fault in one view must not kill the tick (Protected.h parity)."""
    eng = SignalizerEngine("faulty")
    s = AnalysisSession(eng, views=("spectrum", "vectorscope"), axis_points=64)
    s.feed(_sine_block())
    # sabotage the spectrum processor
    s._processors["spectrum"].process = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    frame = s.tick()
    assert frame.spectrum is None  # contained
    assert frame.vectorscope is not None  # others unaffected
    s.close()
