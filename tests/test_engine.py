"""Top-level engine: audio -> presentation -> views, session round-trip."""

import numpy as np
import pytest

from signalizer_tpu.engine import SignalizerEngine
from signalizer_tpu.state.serialize import Archive
from signalizer_tpu.stream.audio_stream import Playhead
from signalizer_tpu.stream.host_graph import HostGraph, PortPair


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for node in HostGraph.live_nodes():
        node.close()
    HostGraph._alias_chains.clear()


def _sine_block(f=1000.0, n=4096, fs=48_000.0, channels=2):
    t = np.arange(n)
    x = np.sin(2 * np.pi * f * t / fs).astype(np.float32)
    return np.broadcast_to(x, (channels, n)).copy()


def test_engine_end_to_end_spectrum():
    eng = SignalizerEngine("test")
    eng.spectrum.channel_configuration.set_transformed(0)  # left
    eng.spectrum.view_scaling.set_transformed(0)  # linear
    eng.spectrum.window_size.set_transformed(1024)
    eng.process_block(_sine_block(6000.0))
    proc = eng.make_spectrum_processor(axis_points=513)
    history = eng.get_presentation_history(1024)
    res = proc.process(history[None])
    row = np.asarray(res)[0, 0, 0, 0]
    # 6 kHz on a 0..24 kHz 513-pixel axis with 1024-pt FFT -> pixel 128
    assert abs(int(np.argmax(row)) - 128) <= 1
    eng.close()


def test_engine_host_parameter_api():
    eng = SignalizerEngine("test")
    n = eng.num_parameters()
    assert n == 47 + 70 + 84  # VS + OS + SC (FTracker added in round 2)
    # flat indexing crosses set boundaries in registration order
    assert eng.get_parameter_name(0).startswith("VS.")
    assert eng.get_parameter_name(47).startswith("OS.")
    assert eng.get_parameter_name(47 + 70).startswith("SC.")
    eng.set_parameter(0, 0.75)
    assert abs(eng.get_parameter(0) - 0.75) < 1e-9
    assert isinstance(eng.get_parameter_text(0), str)
    eng.close()


def test_engine_session_roundtrip():
    eng = SignalizerEngine("a")
    eng.spectrum.low_dbs.set_transformed(-48.0)
    eng.oscilloscope.trigger_mode.set_transformed(4)
    ar = Archive()
    eng.serialize(ar)
    data = ar.to_bytes()
    eng.close()

    eng2 = SignalizerEngine("b")
    eng2.deserialize(Archive.from_bytes(data))
    assert abs(eng2.spectrum.low_dbs.get_transformed() + 48.0) < 1e-6
    assert int(eng2.oscilloscope.trigger_mode.get_transformed()) == 4
    eng2.close()


def test_engine_presets(tmp_path):
    eng = SignalizerEngine("a", preset_dir=tmp_path)
    eng.vectorscope.input_gain.set_transformed(-12.0)
    eng.save_preset("default.main")
    eng.close()
    # a new engine picks up default.main automatically
    eng2 = SignalizerEngine("b", preset_dir=tmp_path)
    assert abs(eng2.vectorscope.input_gain.get_transformed() + 12.0) < 1e-6
    eng2.close()


def test_two_engines_cross_instance_mixing():
    """The sidechain scenario: engine B's audio visible in engine A's
    presentation stream."""
    a = SignalizerEngine("a")
    b = SignalizerEngine("b")
    a.host_graph.connect(b.host_graph.node_id, PortPair(0, 1))

    blk_a = np.zeros((2, 256), np.float32)
    blk_b = np.full((2, 256), 0.25, np.float32)
    for i in range(3):
        ph = Playhead(steady_clock=i * 256)
        b.process_block(blk_b, ph)
        a.process_block(blk_a, ph)
    hist = a.get_presentation_history(256)
    np.testing.assert_allclose(hist[1], 0.25, atol=1e-6)  # b's left in a's ch1
    np.testing.assert_allclose(hist[0], 0.0, atol=1e-6)
    perf = a.perf_snapshot()
    assert perf["mix_synchronized"] == 1.0
    a.close()
    b.close()


def test_engine_all_view_factories():
    eng = SignalizerEngine("views")
    eng.process_block(_sine_block(n=16384))
    osc = eng.make_oscilloscope_processor(pixels=128)
    frame = osc.process(eng.get_presentation_history(16384)[None])
    assert frame.waveform.shape[-1] == 128
    vs = eng.make_vectorscope_processor()
    out = vs.process(eng.get_presentation_history(1024)[None])
    assert out.vertices.shape[-1] == 3
    sg = eng.make_spectrogram_processor(axis_points=64)
    sg.push(_sine_block(n=48_000))
    cols = sg.pull()
    assert cols.shape[1] == 64
    eng.close()


def test_stream_property_changes_rescale_transformatters():
    """ref: AudioHistoryTransformatter::onStreamPropertiesChanged —
    changing sample rate / capacity rescales the window knobs."""
    eng = SignalizerEngine("props")
    assert eng.spectrum.audio_history_transformatter.sample_rate == 48_000.0
    eng.realtime_input.initialize_info(
        lambda info: (setattr(info, "sample_rate", 96_000.0),
                      setattr(info, "audio_history_capacity", 96_000))
    )
    assert eng.spectrum.audio_history_transformatter.sample_rate == 96_000.0
    assert eng.spectrum.audio_history_transformatter.capacity == 96_000
    assert eng.oscilloscope.window_transformatter.sample_rate == 96_000.0
    assert eng.config.sample_rate == 96_000.0
    eng.close()


def test_automation_host_round_trip():
    """UI edits transmit to the host with flat indices between gestures;
    host-sourced updates do NOT echo back (no feedback loop)
    (ref: AutomatedProcessor, PluginProcessor.cpp:116-129)."""
    eng = SignalizerEngine("auto")

    class Host:
        def __init__(self):
            self.changes = []
            self.gestures = []

        def transmit_change(self, index, normalized):
            self.changes.append((index, normalized))

        def begin_gesture(self, index):
            self.gestures.append(("begin", index))

        def end_gesture(self, index):
            self.gestures.append(("end", index))

    host = Host()
    eng.set_automation_host(host)
    p = eng.parameter_map.find_parameter(3)
    eng.begin_parameter_gesture(3)
    p.update_from_ui_normalized(0.42)
    eng.end_parameter_gesture(3)
    assert host.changes == [(3, 0.42)]
    assert host.gestures == [("begin", 3), ("end", 3)]
    # host-sourced updates must not echo back to the host
    eng.set_parameter(3, 0.9)
    assert len(host.changes) == 1
    eng.close()


def test_spectrogram_decay_designed_at_column_rate():
    """Spectrogram decay poles follow the blob cadence, not the render
    fps (ref: CHANGELOG 0.4.0 decay-rate fix): halving the blob size
    (doubling the column rate) moves the per-column pole toward 1."""
    import numpy as np

    eng = SignalizerEngine("sg-decay")
    eng.spectrum.blob_size.set_normalized(0.5)
    p1 = eng.make_spectrogram_processor(axis_points=64)
    eng.spectrum.blob_size.set_normalized(0.4)  # smaller blobs
    p2 = eng.make_spectrogram_processor(axis_points=64)
    pole1 = float(np.asarray(p1.constant.decay_poles)[0])
    pole2 = float(np.asarray(p2.constant.decay_poles)[0])
    assert pole2 > pole1  # faster columns -> slower per-column decay
    eng.close()

def test_restored_history_capacity_reaches_presentation_stream():
    """Restoring a larger history capacity must resize the presentation
    stream the views read, not just the realtime input ring — otherwise
    get_presentation_history(new_cap) raises and the restore's promise is
    hollow."""
    src = SignalizerEngine("cap-src")
    eng = SignalizerEngine("cap-dst")
    try:
        src.config.history_capacity = 96000
        src.realtime_input.initialize_info(
            lambda info: setattr(info, "audio_history_capacity", 96000)
        )
        ar = Archive("signalizer")
        src.serialize(ar)
        eng.deserialize(Archive.from_bytes(ar.to_bytes()))
        assert eng.config.history_capacity == 96000
        block = np.zeros((2, 1024), np.float32)
        eng.process_block(block)
        hist = eng.get_presentation_history(96000)  # must not raise
        assert hist.shape == (2, 96000)
    finally:
        src.close()
        eng.close()
