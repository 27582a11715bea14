"""Every PLACED reference controller-page widget has a browser counterpart.

Mechanically extracts the reference controllers' non-commented
``addControl(&k<widget>, col)`` placements (SpectrumController.cpp:262-367,
OscilloscopeController.cpp:222-306, VectorscopeController.cpp:149-210),
maps each widget to this framework's layout control name, and asserts the
control exists in the corresponding ``views/controllers.py`` page layout
(which the live browser editor renders — tests/test_editor_widgets.py pins
that every layout control resolves to a real parameter/bundle).

Contract (round-4 verdict #7): a NEW widget placed in the reference would
fail the mapping lookup here; a mapped widget missing from our layout
fails the membership check. Widgets the reference constructs but never
places (kshowLegend — commented out in all three controllers; the
oscilloscope's ktransform) are bound parameters with no page slot, and
our layouts deliberately mirror that.

Skips when the reference tree is absent (the mapping tables plus
tests/test_editor_widgets.py still pin our own layout/editor integrity).
"""

import re
from pathlib import Path

import pytest

REF = Path("/root/reference/Source")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not present"
)

# reference widget -> this framework's layout control name
# ("presets" = the layout's special preset widget slot)
SPECTRUM_MAP = {
    "kalgorithm": "Algorithm",
    "kbackgroundColour": "Bck",
    "kbinInterpolation": "BinInterpolation",
    "kblobSize": "BlobSize",
    "kchannelConfiguration": "ChannelConfiguration",
    "kdiagnostics": "Diagnostics",
    "kdisplayMode": "DisplayMode",
    "kdspWin": "DspWin",
    "kfloodFillAlpha": "FloodFillAlpha",
    "kframeUpdateSmoothing": "FrameSmoothing",
    "kfreeQ": "FreeQ",
    "kfrequencyTracker": "FTracker",
    "kgridColour": "Grid",
    "khighDbs": "UpperBound",
    "klowDbs": "LowerBound",
    "kpctForDivision": "PctDivision",
    "kprimitiveSize": "PrimitiveSize",
    "kreferenceTuning": "RefTuning",
    "kslope": "Slope",
    "kspectrumStretching": "SpectrumStretch",
    "ktrackerSmoothing": "TrackerSmoothing",
    "kviewScaling": "ViewScaling",
    "kwidgetColour": "Widget",
    "kwindowSize": "WindowSize",
    "presetManager": "presets",
    # array placements (loop index expanded below)
    "klines[i]->decay": ["Line0Decay", "Line1Decay"],
    "klines[i]->colourOne": ["Line0One", "Line1One"],
    "klines[i]->colourTwo": ["Line0Two", "Line1Two"],
    "kspecColours[i]": [f"Grad{i}" for i in range(5)],
    "kspecRatios[i]": [f"GradRatio{i}" for i in range(5)],
}

OSCILLOSCOPE_MAP = {
    "kantiAlias": "Antialias",
    "kbackgroundColour": "BackgroundColour",
    "kchannelColouring": "ChannelColouring",
    "kchannelConfiguration": "ChannelConfiguration",
    "kcolourSmoothingTime": "ColourSmoothing",
    "kcursorTracker": "CursorTracker",
    "kcustomFrequency": "CustomTriggerFrequency",
    "kdiagnostics": "Diagnostics",
    "kdotSamples": "DotSamples",
    "kenvelopeMode": "AutoGain",
    "kenvelopeSmooth": "EnvelopeWindow",
    "kfreqColourBlend": "FColourBlend",
    "kgain": "InputGain",
    "kgraphColour": "GraphColour",
    "khighColour": "HighColour",
    "klowColour": "LowColour",
    "kmidColour": "MidColour",
    "koverlayChannels": "OverlayChannels",
    "kpctForDivision": "PctDivision",
    "kpresets": "presets",
    "kprimaryColour": "PrimaryColour",
    "kprimitiveSize": "PrimitiveSize",
    "ksecondaryColour": "SecondaryColour",
    "ksubSampleInterpolationMode": "SampleInterpolation",
    "ktimeMode": "TimeMode",
    "ktriggerChannel": "TriggeringChannel",
    "ktriggerHysteresis": "THysteresis",
    "ktriggerMode": "TriggerMode",
    "ktriggerOnCustomFrequency": "CustomTrigger",
    "ktriggerPhaseOffset": "TriggerPhase",
    "ktriggerThreshold": "TThreshold",
    "kwidgetColour": "WidgetColour",
    "kwindow": "WindowSize",
}

VECTORSCOPE_MAP = {
    "kantiAlias": "Antialias",
    "kaxisColour": "GraphColour",  # ref bundle name is "Graph."
    "kbackgroundColour": "BackgroundColour",
    "kdiagnostics": "Diagnostics",
    "kdrawLines": "InterconnectSamples",
    "kenvelopeMode": "AutoGain",
    "kenvelopeSmooth": "EnvelopeWindow",
    "kfadeOld": "FadeOlderPoints",
    "kgain": "InputGain",
    "kmeterColour": "MeterColour",
    "kopMode": "OperationalMode",
    "kpresets": "presets",
    "kprimitiveSize": "PrimitiveSize",
    "krotation": "WaveZRotation",
    "kscalePolar": "ScalePolarModeToFill",
    "kstereoSmooth": "StereoWindow",
    "ktransform": "Transform",
    "kwaveformColour": "DrawingColour",
    "kwidgetColour": "WidgetColour",
    "kwindow": "WindowSize",
    "kwireframeColour": "SkeletonColour",
}

CONTROLLERS = [
    ("Spectrum/SpectrumController.cpp", "SPECTRUM_LAYOUT", SPECTRUM_MAP),
    ("Oscilloscope/OscilloscopeController.cpp", "OSCILLOSCOPE_LAYOUT", OSCILLOSCOPE_MAP),
    ("Vectorscope/VectorscopeController.cpp", "VECTORSCOPE_LAYOUT", VECTORSCOPE_MAP),
]

_ADD = re.compile(r"addControl\(\s*&?([A-Za-z_][\w\[\]>\-\.]*?)(?:\.get\(\))?\s*,")


def _placed_widgets(path: Path):
    """Non-commented addControl targets, normalized."""
    out = set()
    for line in path.read_text(errors="replace").splitlines():
        stripped = line.strip()
        if stripped.startswith("//"):
            continue
        for m in _ADD.finditer(stripped):
            out.add(m.group(1))
    return sorted(out)


def _layout_names(layout_attr):
    import signalizer_tpu.views.controllers as C

    layout = getattr(C, layout_attr)
    names, specials = set(), set()
    for page in layout:
        for section in page.sections:
            for ctl in section.controls:
                if ctl.special:
                    specials.add(ctl.special)
                if ctl.name:
                    names.add(ctl.name)
    return names, specials


@pytest.mark.parametrize("src,layout_attr,mapping", CONTROLLERS)
def test_every_placed_reference_widget_has_a_layout_counterpart(
    src, layout_attr, mapping
):
    placed = _placed_widgets(REF / src)
    assert placed, f"no placements extracted from {src}"
    names, specials = _layout_names(layout_attr)
    unmapped = [w for w in placed if w not in mapping]
    assert not unmapped, (
        f"{src} places widgets with no mapping entry (new reference "
        f"widget?): {unmapped}"
    )
    missing = []
    for w in placed:
        targets = mapping[w]
        if isinstance(targets, str):
            targets = [targets]
        for t in targets:
            if t == "presets":
                if "presets" not in specials:
                    missing.append((w, t))
            elif t not in names:
                missing.append((w, t))
    assert not missing, f"{src}: placed widgets missing from {layout_attr}: {missing}"


@pytest.mark.parametrize("src,layout_attr,mapping", CONTROLLERS)
def test_mapping_tables_carry_no_stale_entries(src, layout_attr, mapping):
    """Every table entry corresponds to a widget the reference still
    places — table rot fails loudly."""
    placed = set(_placed_widgets(REF / src))
    stale = [w for w in mapping if w not in placed]
    assert not stale, f"{src}: mapping entries no longer placed: {stale}"
