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


def test_session_fuzz_knobs_and_reconfigures():
    """Robustness soak: random knob twiddling + targeted reconfigures +
    audio never crash a tick, and every produced view output is finite
    (the reference's quality bar was per-DAW manual soak testing;
    SURVEY.md §4)."""
    rng = np.random.default_rng(1234)
    eng = SignalizerEngine("fuzz")
    s = AnalysisSession(eng, axis_points=128, pixels=64)
    n_params = eng.num_parameters()
    views = list(s.views)
    for step in range(12):
        # random audio block (occasionally silence or mono-ish)
        kind = rng.integers(0, 3)
        if kind == 0:
            block = np.zeros((2, 2048), np.float32)
        else:
            t = np.arange(2048) / FS
            f = float(rng.uniform(30, 18000))
            x = rng.uniform(0.01, 1.0) * np.sin(2 * np.pi * f * t)
            block = np.stack([x, x * rng.uniform(-1, 1)]).astype(np.float32)
        s.feed(block, Playhead(steady_clock=step * 2048, bpm=float(rng.uniform(20, 300)),
                               is_playing=bool(rng.integers(0, 2))))
        # twiddle a handful of random knobs through the host API
        for _ in range(5):
            eng.set_parameter(int(rng.integers(0, n_params)), float(rng.random()))
        # occasionally rebuild a random view from the new knobs
        if step % 3 == 2:
            s.reconfigure(views[int(rng.integers(0, len(views)))])
        frame = s.tick()
        for name, val in (("spectrum", frame.spectrum),):
            if val is not None:
                assert np.isfinite(val).all(), (step, name)
        if frame.oscilloscope is not None:
            assert np.isfinite(np.asarray(frame.oscilloscope.waveform)).all(), step
        if frame.vectorscope is not None:
            assert np.isfinite(np.asarray(frame.vectorscope.vertices)).all(), step
    s.close()


def test_spectrogram_sees_sidechained_sources():
    """The session spectrogram consumes the mixed presentation stream —
    audio arriving only via a sidechain connection must appear in it
    (every other view already reads the presentation history)."""
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.session import AnalysisSession
    from signalizer_tpu.stream.host_graph import PortPair

    a = SignalizerEngine("sg-main")
    b = SignalizerEngine("sg-side")
    try:
        a.host_graph.topology[a.host_graph.node_id] = {PortPair(0, 0), PortPair(1, 1)}
        a.host_graph.connect(b.host_graph.node_id, PortPair(0, 0))
        session = AnalysisSession(a, views=("spectrogram",), axis_points=128)
        fs = a.config.sample_rate
        t = np.arange(1024) / fs
        tone = np.stack([np.sin(2 * np.pi * 1000 * t), 0 * t]).astype(np.float32)
        silence = np.zeros_like(tone)
        from signalizer_tpu.stream.audio_stream import Playhead

        for i in range(24):
            ph = Playhead(steady_clock=i * 1024)
            b.process_block(tone, ph)      # the sidechain carries the tone
            session.feed(silence, ph)      # the main engine hears silence
        frame = session.tick()
        cols = frame.spectrogram_columns
        assert cols is not None and cols.shape[0] > 0
        # the tone mixed in through the graph must light up the columns
        assert np.asarray(cols)[..., :3].max() > 0
        session.close()
    finally:
        b.close()


def test_freeze_holds_the_display():
    """Freeze returns the same frame without consuming; unfreezing resumes
    from live audio (ref: MainEditor kfreeze)."""
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.session import AnalysisSession

    eng = SignalizerEngine("freeze-test")
    session = AnalysisSession(eng, views=("vectorscope",))
    try:
        fs = eng.config.sample_rate
        t = np.arange(1024) / fs
        tone = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
        for _ in range(4):
            session.feed(tone)
        first = session.tick()
        session.freeze = True
        session.feed(tone * 0.1)  # audio keeps flowing
        frozen = session.tick()
        assert frozen is first  # identical frame object: display held
        session.freeze = False
        live = session.tick()
        assert live is not first
    finally:
        session.close()

def test_freeze_does_not_redeliver_spectrogram_columns():
    """A frozen tick must not re-report the last incremental column delta —
    an embedder appending ``spectrogram_columns`` each tick would duplicate
    columns (the internal image is unaffected either way)."""
    eng = SignalizerEngine("freeze-cols")
    session = AnalysisSession(eng, views=("spectrogram",), axis_points=128)
    try:
        for i in range(24):
            session.feed(_sine_block(1024, f=1000.0), Playhead(steady_clock=i * 1024))
        first = session.tick()
        assert first.spectrogram_columns is not None
        assert first.spectrogram_columns.shape[0] > 0
        session.freeze = True
        frozen = session.tick()
        assert frozen.spectrogram_columns is not None
        assert frozen.spectrogram_columns.shape[0] == 0  # held, not duplicated
    finally:
        session.close()


def test_session_resonator_algorithm():
    """Algorithm = Resonator routes tick() through the continuous-stream
    RSNT processor: the spectrum comes out [K, rows, P], the line-graph
    feed builds from it, and the fed tone peaks at its frequency
    (regression: the session used to feed it FFT-style re-read windows,
    double-driving the stateful bank and breaking the result shape)."""
    from signalizer_tpu.core.constant import host_view

    eng = SignalizerEngine("rsnt-session")
    eng.spectrum.algorithm.set_normalized(1.0)  # TransformAlgorithm.RESONATOR (0.5 rounds DOWN to FFT on a 2-choice knob)
    s = AnalysisSession(eng, axis_points=128, views=("spectrum",))
    try:
        for i in range(8):
            s.feed(_sine_block(4096, f=440.0), Playhead(steady_clock=i * 4096))
        frame = s.tick()
        assert frame.spectrum is not None and frame.spectrum.ndim == 3
        assert frame.spectrum.shape[-1] == 128
        assert np.isfinite(frame.spectrum).all()
        assert frame.line_graph is not None and len(frame.line_graph.strips) >= 1
        proc = s._processors["spectrum"]
        freqs = np.asarray(host_view(proc.constant, "mapped_frequencies"))
        peak_hz = freqs[int(np.argmax(frame.spectrum[0, 0]))]
        assert peak_hz == pytest.approx(440.0, rel=0.1)
        # a tick with no new audio holds the readout instead of
        # re-consuming history
        again = s.tick()
        assert again.spectrum is not None
        np.testing.assert_array_equal(again.spectrum, frame.spectrum)
    finally:
        s.close()


def test_session_long_oscilloscope_window():
    """Window sizes beyond the old 16384-sample hardcode read enough
    history (bounded by the stream capacity) instead of silently
    truncating the display."""
    eng = SignalizerEngine("long-osc")
    eng.oscilloscope.window_size.set_normalized(1.0)  # max: full history
    s = AnalysisSession(eng, views=("oscilloscope",), pixels=64)
    try:
        for i in range(16):
            s.feed(_sine_block(4096, f=50.0), Playhead(steady_clock=i * 4096))
        frame = s.tick()
        assert frame.oscilloscope is not None
        assert np.isfinite(np.asarray(frame.oscilloscope.waveform)).all()
    finally:
        s.close()
