"""Editor widget models: every layout control resolves to a live widget,
kinds are correct, and the consequence tiers mechanically agree with the
knob-inventory consumer map (a knob in the wrong tier would either reset
DSP state on a colour drag or silently not apply a shape change)."""

import json

import pytest

from signalizer_tpu.editor import widgets as W
from signalizer_tpu.views.content import (
    OscilloscopeContent,
    SpectrumContent,
    VectorScopeContent,
)
from signalizer_tpu.views.controllers import layout_for

from test_knob_inventory import (
    OSCILLOSCOPE_CONSUMERS,
    SPECTRUM_CONSUMERS,
    VECTORSCOPE_CONSUMERS,
)

CONTENTS = {
    "Spectrum": (SpectrumContent, SPECTRUM_CONSUMERS),
    "Oscilloscope": (OscilloscopeContent, OSCILLOSCOPE_CONSUMERS),
    "Vectorscope": (VectorScopeContent, VECTORSCOPE_CONSUMERS),
}


@pytest.mark.parametrize("name", list(CONTENTS))
def test_every_layout_control_resolves(name):
    cls, _ = CONTENTS[name]
    content = cls()
    for page in layout_for(content):
        for section in page.sections:
            for control in section.controls:
                got = W.resolve_control(content.parameter_set, control)
                assert got is not None, f"{name}:{control.name} did not resolve"
                assert got["kind"] in (
                    "knob", "combo", "toggle", "colour", "bundle",
                    "presets", "tracker",
                )


@pytest.mark.parametrize("name", list(CONTENTS))
def test_pages_are_json_serializable_with_live_values(name):
    cls, _ = CONTENTS[name]
    content = cls()
    pages = W.describe_pages(content)
    json.dumps(pages)  # must be wire-clean
    assert len(pages) >= 3


def test_widget_kinds():
    c = SpectrumContent()
    ps = c.parameter_set
    from signalizer_tpu.views.controllers import Control

    assert W.resolve_control(ps, Control("ViewScaling"))["kind"] == "combo"
    assert W.resolve_control(ps, Control("FreeQ"))["kind"] == "toggle"
    assert W.resolve_control(ps, Control("WindowSize"))["kind"] == "knob"
    grid = W.resolve_control(ps, Control("Grid"))
    assert grid["kind"] == "colour" and len(grid["rgba"]) == 4
    dsp = W.resolve_control(ps, Control("DspWin"))
    assert dsp["kind"] == "bundle"
    assert {m["name"] for m in dsp["members"]} == {
        "DspWin.Type", "DspWin.Alpha", "DspWin.Beta", "DspWin.Symmetric",
    }


def test_combo_reports_options_and_index():
    c = SpectrumContent()
    d = W.describe_parameter(c.view_scaling)
    assert d["options"] == ["linear", "logarithmic"]
    assert d["index"] == 1  # logarithmic default


@pytest.mark.parametrize("name", list(CONTENTS))
def test_tiers_match_knob_inventory(name):
    """constant:/kwargs:/engine: consumers MUST be rebuild tier;
    feed:/tracker: consumers MUST be feed tier; render:/host: consumers
    MUST be render tier. ViewLeft/Right on the spectrum are constant
    fields (rebuild); on the oscilloscope/vectorscope they are render
    hints — the tables encode exactly that."""
    _, consumers = CONTENTS[name]
    for base, claim in consumers.items():
        tier = W.tier_of(name, base)
        klass = claim.split(":", 1)[0]
        want = {
            "constant": "rebuild", "kwargs": "rebuild", "engine": "rebuild",
            "feed": "feed", "tracker": "feed",
            "render": "render", "host": "render",
        }[klass]
        assert tier == want, f"{name}.{base}: tier {tier} but consumer {claim}"


def test_bundle_members_classify_by_base():
    assert W.tier_of("Spectrum", "DspWin.Type") == "rebuild"
    assert W.tier_of("Spectrum", "Grid.R") == "feed"
    assert W.tier_of("Oscilloscope", "PrimaryColour.G") == "rebuild"
    assert W.tier_of("Vectorscope", "DrawingColour.B") == "render"


def test_no_tier_table_names_are_stale():
    """Every name in TIERS must be a real parameter or bundle base."""
    for view, (cls, _) in CONTENTS.items():
        content = cls()
        ps = content.parameter_set
        names = {p.name for p in ps}
        bases = {n.split(".", 1)[0] for n in names}
        for tier_names in W.TIERS[view].values():
            for n in tier_names:
                assert n in names or n in bases, f"stale tier entry {view}.{n}"
