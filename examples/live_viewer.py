"""Interactive live viewer: the MainEditor render loop with real widgets.

A tabbed matplotlib window (the MainEditor analogue, ref:
MainEditor.cpp's timer-driven pulseUI/repaint loop) that generates audio,
feeds an AnalysisSession at the audio cadence, and redraws the selected
view at the engine's ``EditorSettings.refresh_rate_ms``. Tabs follow the
reference's view order; keys 1/2/3/4 switch views like the editor's tab
bar.

Headless rigs: pass ``--frames N --out dir`` to run the same loop
off-screen and write N sequential frames per view instead (used by CI).

Usage:
    python examples/live_viewer.py                 # interactive window
    python examples/live_viewer.py --cpu --frames 3 --out /tmp/lv
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

VIEWS = ("spectrum", "oscilloscope", "vectorscope", "spectrogram")


class SignalGenerator:
    """Evolving stereo test signal: glide tone + beat-synced bursts."""

    def __init__(self, fs: float):
        self.fs = fs
        self.t = 0
        self._phase = 0.0  # oscillator phase carries ACROSS blocks

    def block(self, n: int) -> np.ndarray:
        i = np.arange(self.t, self.t + n)
        self.t += n
        sec = i / self.fs
        f0 = 220.0 * 2.0 ** (0.5 * np.sin(2 * np.pi * 0.1 * sec))  # slow glide
        phase = self._phase + 2 * np.pi * np.cumsum(f0) / self.fs
        self._phase = float(phase[-1]) % (2 * np.pi)
        burst = (np.sin(2 * np.pi * 2.0 * sec) > 0.9).astype(np.float64)
        left = 0.6 * np.sin(phase) + 0.2 * burst * np.sin(2 * np.pi * 3000 * sec)
        right = 0.5 * np.sin(phase + 0.6) + 0.1 * np.sin(2 * np.pi * 880 * sec)
        return np.stack([left, right]).astype(np.float32)


def build(engine_name="live-viewer"):
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.session import AnalysisSession
    from signalizer_tpu.stream.audio_stream import Playhead

    eng = SignalizerEngine(engine_name)
    session = AnalysisSession(eng, axis_points=512, pixels=512)
    gen = SignalGenerator(eng.config.sample_rate)
    playhead = Playhead(bpm=120.0, is_playing=True)
    return eng, session, gen, playhead


def draw(ax_img, view, frame, session, eng):
    """Redraw one view into a dict of artists (kept simple: imshow/line)."""
    import matplotlib.pyplot as plt  # noqa: F401

    ax = ax_img
    ax.clear()
    if view == "spectrum" and frame.spectrum is not None:
        rows = np.asarray(frame.spectrum).reshape(-1, frame.spectrum.shape[-1])
        for r in range(rows.shape[0]):
            ax.plot(rows[r], lw=0.8)
        ax.set_ylim(0.0, 1.0)
        ax.set_title("spectrum (normalized dB)")
    elif view == "oscilloscope" and frame.oscilloscope is not None:
        wave = np.asarray(frame.oscilloscope.waveform)[0]
        for r in range(wave.shape[0]):
            ax.plot(wave[r], lw=0.8)
        ax.set_ylim(-1.5, 1.5)
        ax.set_title("oscilloscope")
    elif view == "vectorscope" and frame.vectorscope is not None:
        v = np.asarray(frame.vectorscope.vertices)[0]
        ax.plot(v[:, 0], v[:, 1], lw=0.5)
        ax.set_xlim(-1.2, 1.2)
        ax.set_ylim(-1.2, 1.2)
        ax.set_title("vectorscope")
    elif view == "spectrogram":
        sg = session.processor("spectrogram")
        if sg is not None:
            img = np.asarray(sg.image.snapshot())  # [time, freq, rgba]
            ax.imshow(np.transpose(img, (1, 0, 2))[::-1], aspect="auto",
                      interpolation="nearest")
        ax.set_title("spectrogram")


def run_headless(out_dir: str, n_frames: int) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    eng, session, gen, playhead = build()
    try:
        fig, ax = plt.subplots(figsize=(8, 4), dpi=80)
        hop = 1024
        refresh_blocks = max(1, int(eng.editor_settings.refresh_rate_ms / 1000.0
                                    * eng.config.sample_rate / hop))
        written = 0
        for view in VIEWS:
            for k in range(n_frames):
                for _ in range(refresh_blocks):
                    session.feed(gen.block(hop), playhead)
                frame = session.tick()
                draw(ax, view, frame, session, eng)
                fig.savefig(out / f"{view}_{k:02d}.png")
                written += 1
        print(f"live_viewer headless: wrote {written} frames at "
              f"{eng.editor_settings.refresh_rate_ms:.0f} ms refresh -> {out}")
        return 0
    finally:
        session.close()
        eng.close()


def run_interactive() -> int:
    import matplotlib.pyplot as plt

    eng, session, gen, playhead = build()
    state = {"view": "spectrum"}
    fig, ax = plt.subplots(figsize=(9, 5))
    fig.canvas.manager.set_window_title("signalizer_tpu — 1/2/3/4 to switch views")

    def on_key(event):
        idx = {"1": 0, "2": 1, "3": 2, "4": 3}.get(event.key)
        if idx is not None:
            state["view"] = VIEWS[idx]
            eng.editor_settings.selected_tab = idx

    fig.canvas.mpl_connect("key_press_event", on_key)
    hop = 1024
    interval_ms = eng.editor_settings.refresh_rate_ms
    blocks_per_tick = max(1, int(interval_ms / 1000.0 * eng.config.sample_rate / hop))

    from matplotlib.animation import FuncAnimation

    def update(_):
        for _ in range(blocks_per_tick):
            session.feed(gen.block(hop), playhead)
        frame = session.tick()
        draw(ax, state["view"], frame, session, eng)
        return []

    anim = FuncAnimation(fig, update, interval=interval_ms, cache_frame_data=False)
    plt.show()
    del anim
    session.close()
    eng.close()
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--frames" in argv:
        i = argv.index("--frames")
        n = int(argv[i + 1])
        del argv[i : i + 2]
        out = "viewer_out"
        if "--out" in argv:
            j = argv.index("--out")
            out = argv[j + 1]
            del argv[j : j + 2]
        sys.exit(run_headless(out, n))
    sys.exit(run_interactive())
