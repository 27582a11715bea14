"""Preset gallery: run every reference .sgn preset through the framework.

For each of the reference's 20 shipped presets (Make/Skeleton/presets/),
load it into an engine via the binary importer, feed a test mix, run one
AnalysisSession tick, and render the preset's own view to PNG — the
"your presets just work" demonstration (ref: CPresetWidget loading,
PluginProcessor.cpp:83-101).

Usage: python examples/preset_gallery.py [out_dir] [--cpu] [--limit N]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def make_mix(fs: float, seconds: float = 1.0) -> np.ndarray:
    """Stereo test content: harmonic tone + high partial + noise floor."""
    t = np.arange(int(seconds * fs)) / fs
    rng = np.random.default_rng(42)
    left = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 3000 * t)
            + 0.01 * rng.standard_normal(len(t)))
    right = (0.4 * np.sin(2 * np.pi * 220 * t + 0.7)
             + 0.2 * np.sin(2 * np.pi * 880 * t)
             + 0.01 * rng.standard_normal(len(t)))
    return np.stack([left, right]).astype(np.float32)


def main(out_dir: str = "gallery_out", limit: int = 0) -> int:
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.session import AnalysisSession
    from signalizer_tpu.state.sgn_import import reference_preset_dir
    from signalizer_tpu.views.render import (
        render_line_graph_frame,
        render_oscilloscope,
        render_spectrogram,
        render_vectorscope,
    )

    corpus = reference_preset_dir()
    if corpus is None:
        print("reference preset corpus not mounted; nothing to do")
        return 0
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    files = sorted(corpus.glob("*.sgn"))
    if limit:
        files = files[:limit]
    rendered = 0
    for path in files:
        view = path.stem.rsplit(".", 1)[-1]
        eng = SignalizerEngine(f"gallery-{path.stem}")
        session = None
        try:
            eng.load_reference_preset(path)
            mix = make_mix(eng.config.sample_rate)
            views = ("spectrum", "oscilloscope", "vectorscope", "spectrogram") \
                if view == "main" else (
                    {"spectrum": ("spectrum", "spectrogram")}.get(view, (view,)))
            session = AnalysisSession(eng, views=views, axis_points=256, pixels=256)
            hop = 1024
            for i in range(0, mix.shape[1] - hop, hop):
                session.feed(mix[:, i : i + hop])
            frame = session.tick()
            stem = path.stem.replace(" ", "_")
            if frame.line_graph is not None:
                render_line_graph_frame(frame.line_graph,
                                        path=str(out / f"{stem}.line_graph.png"))
                rendered += 1
            if frame.oscilloscope is not None and view in ("oscilloscope", "main"):
                hints = eng.oscilloscope.make_render_hints()
                render_oscilloscope(frame.oscilloscope, hints=hints,
                                    path=str(out / f"{stem}.oscilloscope.png"))
                rendered += 1
            if frame.vectorscope is not None and view in ("vectorscope", "main"):
                from signalizer_tpu.views.vectorscope import OperationalMode

                mode = OperationalMode(
                    int(eng.vectorscope.operational_mode.get_transformed())
                ).name.lower()
                hints = eng.vectorscope.make_render_hints()
                render_vectorscope(frame.vectorscope, mode=mode, hints=hints,
                                   path=str(out / f"{stem}.vectorscope.png"))
                rendered += 1
            sg = session.processor("spectrogram")
            if sg is not None and view in ("spectrum", "main"):
                render_spectrogram(sg.image, path=str(out / f"{stem}.spectrogram.png"))
                rendered += 1
            print(f"{path.name}: ok")
        finally:
            # session.close() also closes the engine (idempotent); the
            # eng.close() covers a failure before the session existed
            if session is not None:
                session.close()
            eng.close()
    print(f"gallery: {rendered} renders from {len(files)} presets -> {out}")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if "--cpu" in args:
        args.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    limit = 0
    if "--limit" in args:
        i = args.index("--limit")
        limit = int(args[i + 1])
        del args[i : i + 2]
    sys.exit(main(args[0] if args else "gallery_out", limit=limit))
