"""Global editor-shell settings: archive round trip + reference import."""

from pathlib import Path

import pytest

from signalizer_tpu.state.serialize import Archive
from signalizer_tpu.views.editor_settings import (
    DEFAULT_COLOUR_SCHEME,
    EditorSettings,
)

CORPUS = Path("/root/reference/Make/Skeleton/presets")


def test_archive_round_trip():
    s = EditorSettings(refresh_rate_ms=33.0, render_engine=0,
                       antialias_level=16, vsync=False, swap_interval=3,
                       selected_tab=2, legend_choice=1)
    s.colour_scheme["Error"] = (1.0, 0.2, 0.2, 1.0)
    ar = Archive()
    s.serialize(ar)
    t = EditorSettings()
    t.deserialize(ar)
    assert t.refresh_rate_ms == pytest.approx(33.0)
    assert t.render_engine == 0
    assert t.antialias_level == 16
    assert not t.vsync
    assert t.swap_interval == 3
    assert t.selected_tab == 2
    assert t.legend_choice == 1
    assert t.colour_scheme["Error"] == pytest.approx((1.0, 0.2, 0.2, 1.0))


def test_missing_keys_keep_defaults():
    ar = Archive()
    EditorSettings().serialize(ar)
    # simulate an older archive without the vsync key
    ar._values.pop("vsync", None) if hasattr(ar, "_values") else None
    t = EditorSettings()
    t.deserialize(ar)
    assert t.antialias_level == 8


@pytest.mark.skipif(not CORPUS.is_dir(), reason="reference corpus not mounted")
def test_reference_main_import():
    from signalizer_tpu.state.sgn_import import load_sgn

    s = EditorSettings.from_reference_main(load_sgn(CORPUS / "default.main.sgn"))
    # values stored by the reference release build of default.main
    assert s.refresh_rate_ms == pytest.approx(80.0, rel=0.02)
    assert s.render_engine == 1  # openGL
    assert s.antialias_level == 8
    assert s.vsync is True
    assert s.hide_widgets_on_mouse_exit is True
    assert s.stop_processing_on_suspend is True
    # the colour scheme decodes to the reference's dark theme
    assert s.colour_scheme["Success"] == pytest.approx((0.0, 127 / 255, 0.0, 1.0))
    assert s.colour_scheme["Error"] == pytest.approx((127 / 255, 0.0, 0.0, 1.0))
    grey = s.colour_scheme["Activated"]
    assert grey[0] == grey[1] == grey[2] == pytest.approx(50 / 255)


@pytest.mark.skipif(not CORPUS.is_dir(), reason="reference corpus not mounted")
def test_engine_applies_editor_settings():
    from signalizer_tpu.engine import SignalizerEngine

    eng = SignalizerEngine("editor-settings-test")
    try:
        eng.load_reference_preset(CORPUS / "default.main.sgn")
        assert eng.editor_settings.refresh_rate_ms == pytest.approx(80.0, rel=0.02)
        assert eng.behaviour.stop_processing_on_suspend is True
        # engine archives now persist the editor settings
        from signalizer_tpu.state.serialize import Archive

        ar = Archive()
        eng.serialize(ar)
        eng2 = SignalizerEngine("editor-settings-test-2")
        try:
            eng2.deserialize(ar)
            assert eng2.editor_settings.antialias_level == 8
            assert eng2.editor_settings.colour_scheme == eng.editor_settings.colour_scheme
        finally:
            eng2.close()
    finally:
        eng.close()


def test_default_scheme_is_complete():
    assert len(DEFAULT_COLOUR_SCHEME) == 10
    for rgba in DEFAULT_COLOUR_SCHEME.values():
        assert len(rgba) == 4
