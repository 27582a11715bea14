"""Parameter system, serialization, presets, view contents."""

import math

import numpy as np
import pytest

from signalizer_tpu.params.parameters import (
    BooleanFormatter,
    BooleanRange,
    ChoiceFormatter,
    DBFormatter,
    ExponentialRange,
    IntegerLinearRange,
    LinearRange,
    Parameter,
    ParameterMap,
    ParameterSet,
    PercentageFormatter,
    UnityRange,
)
from signalizer_tpu.params.transformatters import (
    AudioHistoryTransformatter,
    LinearHzFormatter,
    TimeMode,
    WindowSizeTransformatter,
)
from signalizer_tpu.params.values import (
    ColourValue,
    PowerSlopeValue,
    TransformValue,
    WindowDesignValue,
)
from signalizer_tpu.state.presets import PresetManager
from signalizer_tpu.state.serialize import Archive
from signalizer_tpu.views.content import (
    CONTENT_CREATION_LIST,
    OscilloscopeContent,
    SpectrumContent,
    VectorScopeContent,
)


# ---------------------------------------------------------------------------
# transformers / formatters
# ---------------------------------------------------------------------------


def test_ranges_roundtrip():
    for tr, lo, hi in [
        (LinearRange(-96, 12), -96, 12),
        (ExponentialRange(0.5, 1000.0), 0.5, 1000.0),
        (IntegerLinearRange(0, 7), 0, 7),
    ]:
        for n in (0.0, 0.25, 0.5, 1.0):
            v = tr.transform(n)
            assert lo - 1e-9 <= v <= hi + 1e-9
            assert abs(tr.normalize(v) - n) < 1e-9 or isinstance(tr, IntegerLinearRange)


def test_choice_formatter():
    f = ChoiceFormatter(["fft", "resonator"])
    assert f.format(1.0) == "resonator"
    assert f.parse("FFT") == 0.0
    assert f.parse("resonator") == 1.0


def test_parameter_listeners_and_pulse():
    p = Parameter("test", LinearRange(0, 10))
    events = []
    p.add_rt_listener(lambda param, src: events.append(("rt", src)))
    p.add_ui_listener(lambda param, src: events.append(("ui", src)))
    p.update_from_host_normalized(0.5)
    assert events == [("rt", "host")]
    p.pulse_ui()
    assert events[-1] == ("ui", "pulse")
    p.pulse_ui()  # coalesced: no second delivery
    assert len(events) == 2
    assert p.get_transformed() == 5.0
    assert p.version == 1


def test_parameter_text_roundtrip():
    p = Parameter("gain", LinearRange(-120, 120), DBFormatter(), 0.5)
    assert p.get_display_text() == "0 dB"
    assert p.set_from_text("-6 dB")
    assert abs(p.get_transformed() + 6.0) < 1e-9


def test_parameter_map_flat_indexing():
    pm = ParameterMap()
    s1 = pm.add_set(ParameterSet("A", "A."))
    a0 = s1.register_parameter(Parameter("x"))
    a1 = s1.register_parameter(Parameter("y"))
    s2 = pm.add_set(ParameterSet("B", "B."))
    b0 = s2.register_parameter(Parameter("z"))
    assert pm.num_parameters() == 3
    assert pm.find_parameter(0) is a0
    assert pm.find_parameter(2) is b0
    assert pm.flat_index_of(b0) == 2
    assert b0.exported_name == "B.z"
    with pytest.raises(IndexError):
        pm.find_parameter(3)


# ---------------------------------------------------------------------------
# bundles
# ---------------------------------------------------------------------------


def test_colour_value():
    c = ColourValue("test", (0.1, 0.2, 0.3, 1.0))
    np.testing.assert_allclose(c.get_rgba(), (0.1, 0.2, 0.3, 1.0))
    c.set_rgba((1, 0, 0, 0.5))
    np.testing.assert_allclose(c.get_rgba(), (1, 0, 0, 0.5))
    assert len(c.parameters()) == 4


def test_window_design_value():
    from signalizer_tpu.core.windows import WindowType

    w = WindowDesignValue("win", WindowType.BLACKMAN)
    assert w.get_window_type() == WindowType.BLACKMAN
    kernel, scale = w.generate_window(256)
    assert kernel.shape == (256,)
    assert scale > 1.0  # blackman coherent gain < 1


def test_power_slope_derive():
    s = PowerSlopeValue("slope")
    s.base.set_transformed(2.0)
    s.pivot.set_transformed(1000.0)
    s.slope.set_transformed(3.0)  # 3 dB/octave
    a, b = s.derive()
    # slope map at pivot must be 1; one octave up must be +3 dB
    assert abs(b * 1000.0**a - 1.0) < 1e-9
    assert abs(20 * math.log10(b * 2000.0**a) - 3.0) < 1e-9


def test_transform_value_matrix():
    t = TransformValue("tsf")
    m = t.matrix()
    assert m.shape == (3, 3)
    t.rotation[2].set_transformed(90.0)
    for i, s in enumerate(t.scale):
        s.set_transformed(1.0)
    m = t.matrix()
    np.testing.assert_allclose(m @ [1, 0, 0], [0, 1, 0], atol=1e-12)


# ---------------------------------------------------------------------------
# transformatters
# ---------------------------------------------------------------------------


def test_audio_history_transformatter():
    # LINEAR n*capacity (ref: CommonSignalizer.h:408-441); floors at 1
    t = AudioHistoryTransformatter(48_000.0, 48_000)
    assert t.transform(0.0) == 1.0  # ref returns 0; we floor (documented)
    assert t.transform(0.5) == 24_000.0
    assert t.transform(1.0) == 48_000.0
    assert abs(t.normalize(t.transform(0.37)) - 0.37) < 1e-9
    assert t.format(4800.0) == "100.0 ms"
    assert abs(t.parse("100 ms") - 4800.0) < 1e-9
    assert t.parse("1024 smps") == 1024.0


def test_window_size_transformatter_modes():
    t = WindowSizeTransformatter(48_000.0, 48_000)
    t.time_mode = TimeMode.TIME
    # exp over [100, cap] linearly rescaled onto [2, cap]
    # (ref: OscilloscopeParameters.h:199-210)
    assert t.transform(0.0) == 2.0
    assert abs(t.transform(1.0) - 48_000.0) < 1e-6
    assert abs(t.normalize(t.transform(0.37)) - 0.37) < 1e-9
    t.time_mode = TimeMode.CYCLES
    assert t.transform(0.0) == 1.0
    assert t.transform(1.0) == 32.0
    assert t.format(4.0) == "4.00 (25.13 r)"  # ref: "%.2f (%.2f r)"
    assert abs(t.parse("6.28318530718 r") - 1.0) < 1e-9  # radians -> cycles
    t.time_mode = TimeMode.BEATS
    vals = {t.transform(n) for n in np.linspace(0, 1, 21)}
    assert vals <= {1.0, 2.0, 4.0, 8.0, 16.0, 32.0}  # pow2 quantized
    # nextPow2Inc(round(32^(1-n))): n=0.5 -> round(5.66)=6 -> 8
    assert t.transform(0.5) == 8.0
    assert t.format(8.0) == "1/8"  # ref: "1/%.0f"
    # interpret: "1/8" -> reciprocal -> division 8; "2 bars" -> 8 beats
    # -> 1/2... ref: /4 then reciprocal
    assert t.parse("1/8") == 8.0
    assert t.parse("2 bars") == 2.0
    assert abs(t.normalize(8.0) - (1.0 - np.log(8) / np.log(32))) < 1e-9


def test_linear_hz_formatter_notes():
    f = LinearHzFormatter(48_000.0, reference_tuning=440.0)
    assert abs(f.parse("a4") - 440.0) < 1e-9
    assert abs(f.parse("A5") - 880.0) < 1e-9
    assert abs(f.parse("c#3") - 138.591) < 0.01
    assert abs(f.parse("eb4") - 311.127) < 0.01
    assert abs(f.parse("480 smps") - 100.0) < 1e-9
    assert abs(f.parse("10 ms") - 100.0) < 1e-9
    assert abs(f.parse("440 hz") - 440.0) < 1e-9
    assert abs(f.parse("0.1 r") - 0.1 * 48000 / (2 * math.pi)) < 1e-6


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------


def test_archive_roundtrip():
    ar = Archive(version=3)
    ar["x"] = 1.5
    ar["s"] = "hello"
    ar["flag"] = True
    ar["arr"] = np.arange(6, dtype=np.float32).reshape(2, 3)
    ar.child("sub")["y"] = 7
    ar.child("sub").version = 2
    data = ar.to_bytes()
    back = Archive.from_bytes(data)
    assert back.version == 3
    assert back["x"] == 1.5 and back["s"] == "hello" and back["flag"] is True
    np.testing.assert_array_equal(back["arr"], ar["arr"])
    assert back.child("sub")["y"] == 7
    assert back.child("sub").version == 2
    # tolerant reads for version evolution
    assert back.get("added_in_v4", "default") == "default"


def test_archive_rejects_unserializable():
    ar = Archive()
    with pytest.raises(TypeError):
        ar["bad"] = object()


def test_preset_manager(tmp_path):
    pm = PresetManager(tmp_path, factory_dir=tmp_path / "no-factory")
    ar = Archive()
    ar["value"] = 42
    pm.save("test.main", ar)
    assert pm.list_presets() == ["test.main"]
    assert pm.load("test.main")["value"] == 42
    assert pm.try_load("missing") is None
    assert pm.delete("test.main")
    assert pm.list_presets() == []
    # with the shipped factory corpus, user presets merge over it
    pm2 = PresetManager(tmp_path)
    pm2.save("test.main", ar)
    assert "test.main" in pm2.list_presets()
    assert "default.main" in pm2.list_presets()  # factory fallback


# ---------------------------------------------------------------------------
# contents
# ---------------------------------------------------------------------------


def test_contents_roundtrip_through_archive():
    """Full session save/restore across fresh content instances
    (ref: PluginProcessor serialize/deserialize, §3.4)."""
    session = Archive(version=1)
    contents = [cls() for cls in CONTENT_CREATION_LIST]
    # twiddle some knobs
    sc = contents[2]
    sc.low_dbs.set_transformed(-60.0)
    sc.channel_configuration.set_transformed(5)  # separate
    vs = contents[0]
    vs.input_gain.set_transformed(12.0)
    for c in contents:
        c.serialize(session.child(c.NAME))

    restored = [cls() for cls in CONTENT_CREATION_LIST]
    for c in restored:
        c.deserialize(session.child(c.NAME))
    assert abs(restored[2].low_dbs.get_transformed() + 60.0) < 1e-6
    assert int(restored[2].channel_configuration.get_transformed()) == 5
    assert abs(restored[0].input_gain.get_transformed() - 12.0) < 1e-6


def test_spectrum_content_builds_constant():
    sc = SpectrumContent()
    sc.channel_configuration.set_transformed(5)  # separate
    constant = sc.make_constant(axis_points=128)
    assert constant.axis_points == 128
    assert constant.state_channels == 2
    assert constant.view_scaling.name == "LOGARITHMIC"


def test_oscilloscope_content_builds_processor():
    from signalizer_tpu.views.oscilloscope import OscilloscopeProcessor

    oc = OscilloscopeContent()
    oc.trigger_mode.set_transformed(4)  # zero crossing
    kw = oc.make_processor_kwargs()
    proc = OscilloscopeProcessor(pairs=1, pixels=64, **kw)
    frame = proc.process(np.zeros((1, 2, 8192), np.float32))
    assert frame.waveform.shape[-1] == 64


def test_vectorscope_content_builds_processor():
    from signalizer_tpu.views.vectorscope import VectorscopeProcessor

    vc = VectorScopeContent()
    vc.operational_mode.set_transformed(1)  # polar
    proc = VectorscopeProcessor(pairs=1, **vc.make_processor_kwargs())
    out = proc.process(np.zeros((1, 2, 128), np.float32))
    assert out.vertices.shape == (1, 128, 3)


def test_exported_names_have_view_prefixes():
    sc = SpectrumContent()
    assert all(p.exported_name.startswith("SC.") for p in sc.parameter_set)
    oc = OscilloscopeContent()
    assert all(p.exported_name.startswith("OS.") for p in oc.parameter_set)


def test_time_mode_switches_transformatter_and_window():
    """TimeMode knob switches the WindowSize transformatter's unit semantics
    (ref: OscilloscopeParameters.h:465-489) and the engine's Beats window
    tracks the live playhead bpm (ref: Oscilloscope.cpp:293-308)."""
    import numpy as np
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.params.transformatters import TimeMode
    from signalizer_tpu.stream.audio_stream import Playhead

    eng = SignalizerEngine(channels=2)
    oc = eng.oscilloscope
    assert oc.window_transformatter.time_mode == TimeMode.TIME
    oc.time_mode.set_normalized(1.0)  # beats
    assert oc.window_transformatter.time_mode == TimeMode.BEATS
    assert oc.window_size.get_display_text().startswith("1/")  # ref "1/%.0f"

    oc.window_size.set_normalized(1.0)  # 1 bar
    proc = eng.make_oscilloscope_processor(pixels=32)
    # 120 bpm, 1 bar -> 0.5 s -> 24000 samples at 48 kHz
    assert proc.effective_window_samples() == 24_000.0
    # live bpm: the playhead feeds engine.config.bpm which the processor reads
    eng.process_block(np.zeros((2, 64), np.float32), Playhead(bpm=60.0))
    assert proc.effective_window_samples() == 48_000.0

    oc.time_mode.set_normalized(0.5)  # cycles
    assert oc.window_transformatter.time_mode == TimeMode.CYCLES
    assert "r" in oc.window_size.get_display_text()


def test_cycles_mode_feeds_detected_fundamental_back():
    """In Cycles mode the detected cycleSamples resize the next window
    (ref: windowValue * triggerState.cycleSamples + 1)."""
    import numpy as np
    from signalizer_tpu.params.transformatters import TimeMode
    from signalizer_tpu.views.oscilloscope import OscilloscopeProcessor, TriggerMode
    from signalizer_tpu.core.config import OscChannels

    f_hz = 480.0  # exactly 100 samples per cycle at 48 kHz
    proc = OscilloscopeProcessor(
        pairs=1,
        channel_mode=OscChannels.LEFT,
        trigger_mode=TriggerMode.SPECTRAL,
        pixels=64,
        time_mode=TimeMode.CYCLES,
        window_value=4.0,  # 4 cycles
    )
    t = np.arange(16384)
    x = np.sin(2 * np.pi * f_hz * t / 48_000.0).astype(np.float32)
    hist = np.broadcast_to(x, (1, 2, 16384)).copy()
    assert proc.effective_window_samples() == 128.0  # nothing detected yet
    proc.process(hist)
    w = proc.effective_window_samples()
    assert abs(w - (4.0 * 100.0 + 1.0)) < 2.0  # 4 detected cycles + 1


# ---------------------------------------------------------------------------
# factory preset corpus (round-2: ref ships Make/Skeleton/presets/*.sgn)
# ---------------------------------------------------------------------------


def test_factory_corpus_ships_and_loads():
    """Every shipped preset deserializes into a fresh engine and observably
    configures it (ref: 20 presets, default.main at construction)."""
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.state.factory_presets import FACTORY_PRESETS

    eng = SignalizerEngine("presets")
    names = eng.presets.list_presets()
    assert set(FACTORY_PRESETS) <= set(names)
    assert len(names) >= 20
    for name in FACTORY_PRESETS:
        assert eng.load_preset(name), name
    # spot-check effects
    eng.load_preset("polar.vectorscope")
    assert int(eng.vectorscope.operational_mode.get_transformed()) == 1
    eng.load_preset("beats.oscilloscope")
    from signalizer_tpu.params.transformatters import TimeMode
    assert int(eng.oscilloscope.time_mode.get_transformed()) == int(TimeMode.BEATS)
    # a per-view preset leaves other views alone
    eng.load_preset("analytical.spectrum")
    assert int(eng.vectorscope.operational_mode.get_transformed()) == 1  # untouched
    eng.close()


def test_default_preset_loaded_at_construction(tmp_path):
    """A user default.main overrides the factory one at engine creation."""
    from signalizer_tpu.engine import SignalizerEngine

    e1 = SignalizerEngine("a", preset_dir=str(tmp_path))
    e1.spectrum.flood_fill_alpha.set_normalized(0.77)
    e1.save_preset("default.main")
    e1.close()
    e2 = SignalizerEngine("b", preset_dir=str(tmp_path))
    assert e2.spectrum.flood_fill_alpha.get_normalized() == pytest.approx(0.77)
    e2.close()


def test_preset_forward_compat_missing_keys():
    """A v1 archive missing keys (an old preset) deserializes tolerantly:
    present knobs apply, absent ones keep their values."""
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.state.serialize import Archive

    eng = SignalizerEngine("compat")
    before = eng.oscilloscope.window_size.get_normalized()
    old = Archive()
    old.version = 1
    params = old.child("Parameters")
    spec = params.child("Spectrum").child("Parameters")
    spec["FloodFillAlpha"] = 0.9  # only one knob survives from "v1"
    eng.deserialize(old)
    assert eng.spectrum.flood_fill_alpha.get_normalized() == pytest.approx(0.9)
    assert eng.oscilloscope.window_size.get_normalized() == before
    eng.close()


def test_history_capacity_restores_to_live_stream():
    """Restoring a session applies the history capacity to the actual
    stream ring (and fires property listeners), not just the config
    snapshot; the factory default preset must not clobber constructor
    args or host-graph identity."""
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.state.serialize import Archive

    e1 = SignalizerEngine("cap-a", history_capacity=8192)
    assert e1.config.history_capacity == 8192  # factory default didn't clobber
    ar = Archive()
    e1.serialize(ar)
    e2 = SignalizerEngine("cap-b", history_capacity=1024)
    e2.deserialize(ar)
    assert e2.config.history_capacity == 8192
    assert e2.realtime_output.info.audio_history_capacity == 8192
    assert e2.realtime_output._stream._history.capacity == 8192
    # transformatters rescaled through the property listener
    assert e2.spectrum.audio_history_transformatter.capacity == 8192.0
    e3 = SignalizerEngine("cap-c")
    assert e1.host_graph.node_id != e3.host_graph.node_id
    for e in (e1, e2, e3):
        e.close()

def test_linear_hz_formatter_beats_and_exponential_clamp():
    """Beats parse multiplies (v * bpm / 60) — the reference's interpret
    (OscilloscopeParameters.h:331-334) — and an exponential-range knob
    clamps out-of-domain typed input instead of raising."""
    from signalizer_tpu.params.parameters import ExponentialRange

    f = LinearHzFormatter(48_000.0, bpm=120.0)
    assert abs(f.parse("2 beats") - 4.0) < 1e-9  # (2 * 120) / 60
    r = ExponentialRange(20.0, 20_000.0)
    assert r.normalize(0.0) == 0.0       # typed "0": clamp, don't raise
    assert r.normalize(-5.0) == 0.0
    assert r.normalize(40_000.0) == 1.0

def test_per_view_factory_preset_preserves_editor_settings():
    """Per-view factory presets must not carry an Editor subtree — loading
    one would silently clobber the user's editor settings with the
    authoring engine's defaults."""
    from signalizer_tpu.engine import SignalizerEngine

    eng = SignalizerEngine("editor-keep")
    try:
        eng.editor_settings.refresh_rate_ms = 250.0
        assert eng.load_preset("polar.vectorscope")
        assert eng.editor_settings.refresh_rate_ms == 250.0
    finally:
        eng.close()


def test_generate_factory_presets_into_fresh_directory(tmp_path):
    """generate_factory_presets(dir, overwrite=False) must check existence
    in the TARGET directory — the loader's factory-corpus fallback made it
    skip everything and write nothing."""
    from signalizer_tpu.state.factory_presets import (
        FACTORY_PRESETS,
        generate_factory_presets,
    )

    n = generate_factory_presets(tmp_path, overwrite=False)
    assert n == len(FACTORY_PRESETS)
    assert len(list(tmp_path.glob("*.sgz"))) == n

def test_reference_knob_range_parity():
    """Pin the knob range/formatter semantics that must match the
    reference headers (a host automates NORMALIZED values and .sgn
    presets carry them, so the normalized->transformed map IS the
    compatibility contract)."""
    from signalizer_tpu.views.content import (
        OscilloscopeContent,
        SpectrumContent,
        VectorScopeContent,
    )

    sc = SpectrumContent(48_000.0, 48_000)
    # AudioHistoryTransformatter: linear n*capacity (CommonSignalizer.h:408)
    sc.window_size.set_normalized(0.5)
    assert sc.window_size.get_transformed() == 24_000.0
    # ViewRight: reverseUnitRange (SpectrumParameters.h:98,128)
    sc.view_right.set_normalized(0.0)
    assert sc.view_right.get_transformed() == 1.0
    sc.view_right.set_normalized(1.0)
    assert sc.view_right.get_transformed() == 0.0
    # line decay: unit fraction shown as dB (dbSecFormatter)
    sc.lines[0][0].set_normalized(0.5)
    assert sc.lines[0][0].get_display_text().endswith("dB/s")
    # pctForDivision/FrameSmoothing: basicFormatter, not percent
    assert "%" not in sc.pct_for_division.get_display_text()
    assert "%" not in sc.frame_update_smoothing.get_display_text()

    oc = OscilloscopeContent(48_000.0, 48_000)
    # triggerThresholdRange (0, 4) amplitude shown in dB (:371,402)
    oc.trigger_threshold.set_normalized(0.5)
    assert oc.trigger_threshold.get_transformed() == 2.0
    assert oc.trigger_threshold.get_display_text().endswith("dB")
    # customTriggerRange LINEAR (5, 48000) (:369)
    oc.custom_trigger_frequency.set_normalized(0.5)
    assert oc.custom_trigger_frequency.get_transformed() == pytest.approx(24_002.5)
    # triggerChannelRange 1-based (1, 16) (:372); kernels get 0-based
    oc.triggering_channel.set_normalized(0.0)
    assert oc.triggering_channel.get_transformed() == 1
    assert oc.make_processor_kwargs()["trigger_channel"] == 0
    # envelope window LINEAR (0, 1000) ms (:364)
    oc.envelope_window.set_normalized(0.5)
    assert oc.envelope_window.get_transformed() == 500.0
    # ViewRight/ViewBottom reversed (:420-423)
    oc.view_offsets[2].set_normalized(0.0)
    assert oc.view_offsets[2].get_transformed() == 1.0

    vc = VectorScopeContent(48_000.0, 48_000)
    vc.envelope_window.set_normalized(0.25)
    assert vc.envelope_window.get_transformed() == 250.0  # display 250 ms
    # kernels consume normalized as seconds = displayed/1000
    assert vc.make_processor_kwargs()["envelope_window"] == pytest.approx(0.25)


def test_window_size_normalize_degenerate_capacity():
    """A history at or below the 100-sample TIME floor must not divide
    by log(1)=0 in normalize (round-3 review)."""
    from signalizer_tpu.params.transformatters import WindowSizeTransformatter

    tf = WindowSizeTransformatter(48_000.0, 16384)
    tf.set_stream_properties(48_000.0, 100)
    assert tf.normalize(50.0) == 0.0
    tf.set_stream_properties(48_000.0, 64)
    assert 0.0 <= tf.normalize(10.0) <= 1.0


def test_archive_rejects_newer_format():
    """Review regression: from_bytes must refuse a future format version
    instead of silently mis-decoding it with format-1 rules."""
    import json

    import pytest

    from signalizer_tpu.state.serialize import Archive

    ar = Archive()
    ar["x"] = 1
    doc = json.loads(ar.to_bytes())
    doc["format"] = 99
    with pytest.raises(ValueError, match="format"):
        Archive.from_bytes(json.dumps(doc).encode())
    # current format still round-trips
    assert Archive.from_bytes(ar.to_bytes())["x"] == 1


def test_preset_try_load_tolerates_corrupt_archives(tmp_path):
    """Review regression: try_load returned None only for
    FileNotFoundError/ValueError, but corrupt archives raise
    KeyError/AttributeError/TypeError out of from_bytes — a malformed
    default preset crashed engine construction."""
    from signalizer_tpu.state.presets import PresetManager

    pm = PresetManager(tmp_path)
    cases = {
        "keyerror": b'{"magic": "signalizer-tpu/archive", "format": 1}',  # no root
        "attrerror": b'{"magic": "signalizer-tpu/archive", "format": 1, "root": []}',
        "typeerror": b'{"magic": "signalizer-tpu/archive", "format": 1, "root": '
        b'{"values": {"v": {"__ndarray__": "x", "dtype": 42, "shape": 1}}, '
        b'"children": {}, "version": 0}}',
        "junk": b"not json at all",
    }
    for name, payload in cases.items():
        (tmp_path / f"{name}.sgz").write_bytes(payload)
        assert pm.try_load(name) is None, name
