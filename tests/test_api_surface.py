"""Lock the public api facade: every documented entry point stays importable.

The facade (signalizer_tpu/api.py) is the one import surface embedders are
told to use (README quickstart, docs/MIGRATION.md); a rename anywhere in the
package must not silently drop a public name. Grouped by the SURVEY.md §7
layer each name serves.
"""

import signalizer_tpu.api as api

EXPECTED = {
    # engine / host integration (ref: AudioProcessor shell)
    "SignalizerEngine", "ConcurrentConfig",
    # configuration enums
    "BinInterpolation", "DisplayMode", "OscChannels", "SpectrumChannels",
    "TransformAlgorithm", "ViewScaling", "WindowType",
    # constants + windows
    "SpectrumConstant", "make_spectrum_constant", "generate_window",
    # view processors + frames
    "SpectrumProcessor", "ResonatorSpectrumProcessor",
    "OscilloscopeProcessor", "OscilloscopeFrame", "SubSampleInterpolation",
    "TriggerMode",
    "VectorscopeProcessor", "VectorscopeFrame", "AutoGain", "OperationalMode",
    "SpectrogramProcessor", "SpectrogramImage",
    # contents (parameter models)
    "SpectrumContent", "OscilloscopeContent", "VectorScopeContent",
    # stream layer
    "AudioStream", "AudioStreamInfo", "Playhead", "HostGraph", "PortPair",
    "MixGraph", "FramePipeline",
    # state / presets
    "PresetManager", "Archive", "SgnPreset", "apply_preset", "load_sgn",
    "save_sgn", "EditorSettings",
    # session / render
    "AnalysisSession", "SessionFrame", "LineGraphFrame", "LineGraphRenderFeed",
    "FrequencyTracker",
    # diagnostics
    "log_exception", "protected_call",
    # editor / layouts
    "EditorShell", "layout_for", "Page", "Section", "Control",
    # multi-chip
    "ShardedAnalysisPipeline", "PipelineOutput",
}


def test_facade_exports_every_documented_name():
    missing = sorted(n for n in EXPECTED if not hasattr(api, n))
    assert not missing, f"api facade lost public names: {missing}"


def test_facade_names_are_not_none():
    for n in EXPECTED:
        assert getattr(api, n) is not None, n
