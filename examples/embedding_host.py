"""Embedding walkthrough: everything a host integration touches.

A miniature "DAW" hosting two analysis instances — the full surface a
user of the reference plugin would reach for, as runnable code:

* two engines with cross-instance routing (sidechain analysis)
* factory + user presets
* the flat host-parameter API with automation callbacks + gestures
* the per-tick AnalysisSession over all four views
* cursor frequency tracking, diagnostics, perf counters
* session save/restore

Usage: python examples/embedding_host.py [--cpu]
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from signalizer_tpu.api import (
        AnalysisSession,
        Archive,
        Playhead,
        PortPair,
        SignalizerEngine,
    )

    fs = 48_000.0
    rng = np.random.default_rng(0)

    # --- two instances, sidechained -------------------------------------
    main_track = SignalizerEngine("main-track")
    side_track = SignalizerEngine("kick-bus")
    # route the kick bus's left channel onto the main analyzer's channel 1
    main_track.host_graph.connect(side_track.host_graph.node_id, PortPair(0, 1))

    # --- presets ----------------------------------------------------------
    print("factory presets:", len(main_track.presets.list_presets()))
    main_track.load_preset("analytical.spectrum")
    main_track.spectrum.frequency_tracker.set_normalized(1 / 3)  # transform

    # --- host automation ---------------------------------------------------
    class AutomationLog:
        def __init__(self):
            self.events = []

        def transmit_change(self, index, value):
            self.events.append((index, round(value, 3)))

        def begin_gesture(self, index):
            self.events.append(("begin", index))

        def end_gesture(self, index):
            self.events.append(("end", index))

    automation = AutomationLog()
    main_track.set_automation_host(automation)
    # a UI drag on parameter 0
    main_track.begin_parameter_gesture(0)
    main_track.parameter_map.find_parameter(0).update_from_ui_normalized(0.6)
    main_track.end_parameter_gesture(0)
    print("automation events:", automation.events)

    # --- the analysis loop ----------------------------------------------------
    session = AnalysisSession(
        main_track, axis_points=400, pixels=400, cursor_fraction=440.0 / (fs / 2)
    )
    n = 4096
    t = np.arange(n) / fs
    for i in range(8):
        phase = i * n / fs
        melody = 0.5 * np.sin(2 * np.pi * 440.0 * (t + phase))
        kick = 0.8 * np.sin(2 * np.pi * 60.0 * (t + phase)) * np.exp(-((t % 0.5) * 20))
        # audio cadence: both instances ingest their own audio
        side_track.process_block(
            np.stack([kick, kick]).astype(np.float32),
            Playhead(steady_clock=i * n, bpm=128.0, is_playing=True),
        )
        session.feed(
            np.stack([melody, melody]).astype(np.float32),
            Playhead(steady_clock=i * n, bpm=128.0, is_playing=True),
        )
        frame = session.tick()  # UI cadence

    print("spectrum rows:", frame.spectrum.shape)
    print("line graph strips:", len(frame.line_graph.strips))
    print("oscilloscope gain:", float(frame.oscilloscope.gain[0]))
    print("vectorscope balance:", float(frame.vectorscope.balance[0, 0]))
    if frame.tracker:
        print(f"tracker: {frame.tracker['frequency']:.1f} Hz ({frame.tracker['note']})")
    print("diagnostics:", {k: round(v, 2) for k, v in frame.diagnostics.items()})
    print("mix perf:", main_track.perf_snapshot())

    # the sidechain is mixed in: channel 1 of the presentation stream
    # carries the kick bus
    hist = main_track.get_presentation_history(n)
    print("presentation ch1 (sidechain) rms:", float(np.sqrt((hist[1] ** 2).mean())))

    # --- session save/restore ---------------------------------------------
    with tempfile.TemporaryDirectory() as d:
        main_track.presets = type(main_track.presets)(d)
        main_track.save_preset("my-session")
        restored = SignalizerEngine("restored", preset_dir=d)
        ar = Archive()
        main_track.serialize(ar)
        restored.deserialize(ar)
        same = all(
            abs(restored.get_parameter(i) - main_track.get_parameter(i)) < 1e-9
            for i in range(main_track.num_parameters())
        )
        print("state round-trip exact:", same)
        restored.close()

    session.close()
    side_track.close()


if __name__ == "__main__":
    main()
