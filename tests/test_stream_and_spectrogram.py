"""Stream layer (ring/batcher/AudioStream) + colormap + spectrogram tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from signalizer_tpu.core.config import (
    BinInterpolation,
    DisplayMode,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.kernels.colormap import (
    blend_pairs,
    gradient_map,
    normalize_ratios,
    quantize_rgba8,
)
from signalizer_tpu.stream.audio_stream import AudioStream, AudioStreamInfo, Playhead
from signalizer_tpu.stream.batcher import FrameBatcher
from signalizer_tpu.stream.ring_buffer import RingBuffer
from signalizer_tpu.views.spectrogram import SpectrogramProcessor


# ---------------------------------------------------------------------------
# ring buffer
# ---------------------------------------------------------------------------


def test_ring_latest_and_wrap():
    rb = RingBuffer(2, 10)
    rb.write(np.arange(8, dtype=np.float32).reshape(1, 8).repeat(2, 0))
    np.testing.assert_array_equal(rb.latest(4)[0], [4, 5, 6, 7])
    # zero-padded left when underfilled
    np.testing.assert_array_equal(rb.latest(10)[0][:2], [0, 0])
    rb.write(np.full((2, 5), 9.0, np.float32))  # wraps
    np.testing.assert_array_equal(rb.latest(6)[0], [7, 9, 9, 9, 9, 9])
    assert rb.sample_clock == 13


def test_ring_oversized_write():
    rb = RingBuffer(1, 4)
    rb.write(np.arange(10, dtype=np.float32)[None])
    np.testing.assert_array_equal(rb.latest(4)[0], [6, 7, 8, 9])


def test_ring_read_at_clock():
    rb = RingBuffer(1, 100)
    rb.write(np.arange(50, dtype=np.float32)[None])
    np.testing.assert_array_equal(rb.read_at(30, 5)[0], [25, 26, 27, 28, 29])
    with pytest.raises(ValueError):
        rb.read_at(60, 5)  # future
    rb2 = RingBuffer(1, 8)
    rb2.write(np.arange(20, dtype=np.float32)[None])
    with pytest.raises(ValueError):
        rb2.read_at(5, 4)  # overwritten


# ---------------------------------------------------------------------------
# frame batcher
# ---------------------------------------------------------------------------


def test_batcher_contiguous_frames():
    fb = FrameBatcher(1, window=8, hop=8)
    fb.push(np.arange(20, dtype=np.float32)[None])
    frames = fb.pull()
    assert frames.shape == (2, 1, 8)
    np.testing.assert_array_equal(frames[0, 0], np.arange(8))
    np.testing.assert_array_equal(frames[1, 0], np.arange(8, 16))
    # incremental: only one more complete frame exists at clock 30
    fb.push(np.arange(20, 30, dtype=np.float32)[None])
    frames = fb.pull()
    assert frames.shape == (1, 1, 8)
    np.testing.assert_array_equal(frames[0, 0], np.arange(16, 24))


def test_batcher_50_percent_overlap():
    """BASELINE config 4: 50% overlap framing."""
    fb = FrameBatcher(1, window=16, hop=8)
    fb.push(np.arange(40, dtype=np.float32)[None])
    frames = fb.pull()
    assert frames.shape == (4, 1, 16)
    np.testing.assert_array_equal(frames[0, 0], np.arange(16))
    np.testing.assert_array_equal(frames[1, 0], np.arange(8, 24))
    np.testing.assert_array_equal(frames[3, 0], np.arange(24, 40))


def test_batcher_fractional_hop():
    fb = FrameBatcher(1, window=4, hop=2.5, capacity=64)
    fb.push(np.arange(20, dtype=np.float32)[None])
    frames = fb.pull()
    assert frames.shape[0] == 7  # floor((20-4)/2.5)+1
    # frame k covers [round(2.5k)-ish, +4); frame 2 ends at round(5)+4
    np.testing.assert_array_equal(frames[0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(frames[2, 0], [5, 6, 7, 8])
    assert frames.shape[0] == fb._next_frame


def test_batcher_fractional_hop_never_loses_ready_frames():
    """Readiness and the read path must agree on the rounded end clock:
    with ample capacity and incremental pushes, no frame is ever dropped
    or skipped, whatever the fractional hop (regression: frames_ready used
    the exact product while pull read at round(k*hop)+window)."""
    rng = np.random.default_rng(7)
    for hop in (2.5, 2.6, 1.1, 0.7, 3.9999, 5.5):
        fb = FrameBatcher(1, window=8, hop=hop, capacity=4096)
        clock = 0
        emitted = []
        for _ in range(50):
            n = int(rng.integers(1, 12))
            fb.push(np.arange(clock, clock + n, dtype=np.float32)[None])
            clock += n
            frames = fb.pull()
            emitted.extend(frames[:, 0, :])
        assert fb.dropped_frames == 0
        # every emitted frame k must be exactly samples [round(k*hop), +8)
        for k, frame in enumerate(emitted):
            start = int(k * hop + 0.5)  # round-half-up, the native convention
            np.testing.assert_array_equal(frame, np.arange(start, start + 8), err_msg=f"hop={hop} k={k}")


def test_batcher_drops_overwritten_frames():
    fb = FrameBatcher(1, window=4, hop=2.5)  # tiny default capacity (16)
    fb.push(np.arange(20, dtype=np.float32)[None])
    frames = fb.pull()
    assert fb.dropped_frames == 2  # frames 0 and 1 fell out of the ring
    assert frames.shape[0] == 5
    np.testing.assert_array_equal(frames[0, 0], [5, 6, 7, 8])


# ---------------------------------------------------------------------------
# audio stream
# ---------------------------------------------------------------------------


class _Collector:
    def __init__(self):
        self.blocks = []
        self.props = 0
        self.died = 0

    def on_stream_audio(self, ctx, block):
        self.blocks.append((block.copy(), ctx.playhead.steady_clock))

    def on_stream_properties_changed(self, ctx, before):
        self.props += 1

    def on_stream_died(self, ctx):
        self.died += 1


def test_audio_stream_sync_delivery_and_history():
    inp, out = AudioStream.create(threaded=False, info=AudioStreamInfo(channels=2, audio_history_capacity=64))
    c = _Collector()
    out.add_listener(c)
    block = np.random.default_rng(0).standard_normal((2, 32)).astype(np.float32)
    inp.process_incoming_audio(block, Playhead(steady_clock=100, is_playing=True))
    assert len(c.blocks) == 1
    np.testing.assert_array_equal(out.get_history(32), block)
    # property change fires listeners
    inp.initialize_info(lambda info: setattr(info, "sample_rate", 96_000.0))
    assert c.props == 1


def test_audio_stream_threaded_delivery():
    inp, out = AudioStream.create(threaded=True, info=AudioStreamInfo(channels=1, audio_history_capacity=256))
    c = _Collector()
    out.add_listener(c)
    for i in range(10):
        inp.process_incoming_audio(np.full((1, 16), float(i), np.float32))
    stream = out._stream
    assert stream.wait_for_drain()
    assert len(c.blocks) == 10
    stream.close()
    assert c.died == 1


def test_audio_stream_channel_adaptation():
    """Mono input into a stereo stream gets a zero surrogate channel
    (ref: PluginProcessor.cpp:179-193)."""
    inp, out = AudioStream.create(threaded=False, info=AudioStreamInfo(channels=2, audio_history_capacity=32))
    inp.process_incoming_audio(np.ones((1, 8), np.float32))
    h = out.get_history(8)
    np.testing.assert_array_equal(h[0], np.ones(8))
    np.testing.assert_array_equal(h[1], np.zeros(8))


# ---------------------------------------------------------------------------
# colormap
# ---------------------------------------------------------------------------


def _gradient_oracle(intensity, colours, ratios):
    """Per-pixel loop from the reference semantics (SpectrumDSP.cpp:119-169)."""
    out = np.zeros((len(intensity), 3))
    for i, x in enumerate(intensity):
        if x < 0:
            # ref: `if (intensity < 0) continue;` over a zero-initialized
            # accumulation buffer — contributes nothing (black)
            continue
        if x >= 0.999:
            out[i] = colours[-1]
            continue
        acc = 0.0
        for c in range(1, len(ratios)):
            nxt = ratios[c]
            acc += nxt
            if acc >= x:
                lo, hi = acc - nxt, acc
                mix = (x - lo) / (hi - lo)
                out[i] = colours[c - 1] * (1 - mix) + colours[c] * mix
                break
        else:
            out[i] = colours[-1]
    return out


def test_gradient_matches_oracle():
    rng = np.random.default_rng(5)
    colours = rng.random((6, 3)).astype(np.float32)
    ratios = normalize_ratios([0, 1, 2, 1, 3, 1]).astype(np.float32)
    intensity = np.concatenate([[-0.5, 0.0, 0.9995, 1.5], rng.random(100)]).astype(np.float32)
    got = np.asarray(gradient_map(jnp.asarray(intensity), jnp.asarray(colours), jnp.asarray(ratios)))
    want = _gradient_oracle(intensity.astype(np.float64), colours.astype(np.float64), ratios)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_blend_pairs_matches_sequential():
    rng = np.random.default_rng(6)
    srcs = rng.random((4, 10, 3)).astype(np.float32)
    acc = np.zeros((10, 3))
    for s in srcs:
        acc += (1 - acc) * s
    got = np.asarray(blend_pairs(jnp.asarray(srcs)))
    np.testing.assert_allclose(got, acc, rtol=1e-5, atol=1e-6)


def test_quantize_rgba8():
    q = np.asarray(quantize_rgba8(jnp.asarray([[0.0, 0.5, 1.0]])))
    assert q.tolist() == [[0, 127, 255, 255]]


# ---------------------------------------------------------------------------
# spectrogram end-to-end
# ---------------------------------------------------------------------------


def test_spectrogram_stream_end_to_end():
    """A sine fed through the full streaming pipeline must light up the
    pixel at its frequency and leave silence columns at the background."""
    fs = 48_000.0
    proc = SpectrogramProcessor(
        pairs=1,
        blob_ms=10.0,
        axis_points=128,
        window_size=1024,
        sample_rate=fs,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
        low_dbs=-96.0,
        high_dbs=0.0,
        decay_seconds=(0.05, 0.5),
        frames_per_second=100.0,
    )
    t = np.arange(9600)
    f_hz = 6000.0  # quarter of Nyquist -> pixel 32 of 128
    sine = 0.9 * np.sin(2 * np.pi * f_hz * t / fs)
    block = np.stack([sine, np.zeros_like(sine)]).astype(np.float32)
    proc.push(block)
    cols = proc.pull()
    assert cols.shape[0] == 18  # floor((9600-1024)/480)+1
    assert cols.shape[1:] == (128, 4)
    last = cols[-1].astype(np.int32)
    peak_px = int(np.argmax(last[..., :3].sum(-1)))
    assert abs(peak_px - 32) <= 1
    # silence -> background colour (black)
    proc2 = SpectrogramProcessor(
        pairs=1, blob_ms=10.0, axis_points=64, window_size=512, sample_rate=fs,
        configuration=SpectrumChannels.LEFT,
    )
    proc2.push(np.zeros((2, 4800), np.float32))
    cols2 = proc2.pull()
    assert cols2.shape[0] > 0
    assert np.all(cols2[..., :3] == 0)


def test_spectrogram_image_scroll():
    from signalizer_tpu.views.spectrogram import SpectrogramImage

    img = SpectrogramImage(4, 2)
    cols = np.arange(3 * 2 * 4, dtype=np.uint8).reshape(3, 2, 4)
    img.push_columns(cols)
    snap = img.snapshot()
    # oldest-first: one empty column then the three pushed
    np.testing.assert_array_equal(snap[1], cols[0])
    np.testing.assert_array_equal(snap[3], cols[2])
    img.push_columns(cols + 100)  # wraps
    snap = img.snapshot()
    np.testing.assert_array_equal(snap[3], cols[2] + 100)


def test_column_pacer_smooths_consumption():
    from signalizer_tpu.views.spectrogram import ColumnPacer

    pacer = ColumnPacer(smoothing=0.8)
    # bursty availability: 0,0,9,0,0,9,... should smooth toward 3/tick
    takes = []
    backlog = 0
    for i in range(60):
        arriving = 9 if i % 3 == 2 else 0
        backlog += arriving
        take = pacer.columns_for_tick(backlog)
        assert 0 <= take <= backlog
        backlog -= take
        takes.append(take)
    # consumed everything eventually and without giant spikes at the end
    assert sum(takes) == 9 * 20 - backlog
    assert max(takes[30:]) <= 9
    assert np.mean(takes[30:]) > 1.5


def test_spectrogram_multi_pair_blending():
    """Two pairs: the blended column must contain both pairs' energy with
    hue-rotated palettes (ref: generateSpectrogramColourRotation +
    GL_ONE_MINUS_SRC_COLOR accumulation)."""
    fs = 48_000.0
    proc = SpectrogramProcessor(
        pairs=2, blob_ms=10.0, axis_points=128, window_size=1024, sample_rate=fs,
        configuration=SpectrumChannels.LEFT, view_scaling=ViewScaling.LINEAR,
        bin_interpolation=BinInterpolation.LINEAR,
    )
    t = np.arange(4800)
    tone_a = 0.9 * np.sin(2 * np.pi * 3000.0 * t / fs)  # pixel ~16
    tone_b = 0.9 * np.sin(2 * np.pi * 9000.0 * t / fs)  # pixel ~48
    block = np.stack([tone_a, np.zeros_like(t), tone_b, np.zeros_like(t)]).astype(np.float32)
    proc.push(block)
    cols = proc.pull()
    assert cols.shape[0] > 0
    last = cols[-1].astype(np.int32)[..., :3].sum(-1)
    peaks = np.argsort(last)[-8:]
    assert any(abs(int(p) - 16) <= 1 for p in peaks), "pair A tone missing"
    assert any(abs(int(p) - 48) <= 1 for p in peaks), "pair B tone missing"


def test_spectrogram_debug_checkerboard_pattern():
    """The SIGNALIZER_VISUALDEBUGTEST analogue: a checkerboard pushed
    through the column upload path survives scroll + stretch intact."""
    from signalizer_tpu.views.spectrogram import SpectrogramImage

    img = SpectrogramImage(16, 16)
    img.push_debug_checkerboard(columns=16)
    snap = img.snapshot()
    assert snap.shape == (16, 16, 4)
    # alternating 2-column x 8-row blocks
    assert snap[0, 0, 0] != snap[2, 0, 0]
    assert snap[0, 0, 0] != snap[0, 8, 0]
    assert snap[0, 0, 0] == snap[1, 7, 0]
    # stretched image repeats columns
    img2 = SpectrogramImage(16, 16, stretch=2)
    img2.push_debug_checkerboard(columns=8)
    s2 = img2.snapshot()
    assert s2.shape == (16, 16, 4)
    np.testing.assert_array_equal(s2[0], s2[1])  # each column doubled

def test_spectrogram_pull_chunking_matches_one_shot():
    """pull() consumes pending frames in power-of-two chunks (bounding the
    compiled shape set against pacer-driven T jitter) — the chunked path
    must be state-exact vs pulling everything in one call."""
    fs = 48_000.0
    kwargs = dict(
        pairs=1, blob_ms=10.0, axis_points=64, window_size=512, sample_rate=fs,
        configuration=SpectrumChannels.LEFT, bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR, decay_seconds=(0.05, 0.5),
        frames_per_second=100.0,
    )
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((2, 6000)).astype(np.float32) * 0.5

    a = SpectrogramProcessor(**kwargs)
    a.push(audio)
    one_shot = a.pull()          # t = 12 -> chunks 8 + 4 internally
    assert one_shot.shape[0] == 12

    b = SpectrogramProcessor(**kwargs)
    b.push(audio)
    parts = [b.pull(max_frames=5), b.pull(max_frames=3), b.pull()]
    split = np.concatenate(parts, axis=0)
    np.testing.assert_array_equal(one_shot, split)


def test_frame_pipeline_orders_and_threads_state():
    """FramePipeline: outputs arrive in submission order, state threads
    through every step, depth bounds the in-flight window
    (ref: the SFrameQueue decoupling, Spectrum.h:139-143)."""
    import jax
    import jax.numpy as jnp

    from signalizer_tpu.stream.frame_pipeline import FramePipeline

    @jax.jit
    def step(state, frame):
        new_state = state + jnp.sum(frame)
        return (new_state, frame * 2.0), new_state

    pipe = FramePipeline(step, jnp.float32(0.0), depth=3)
    frames = [np.full((4,), float(i + 1), np.float32) for i in range(6)]
    outs = []
    for f in frames:
        outs.extend(pipe.submit(f))
        assert pipe.in_flight <= 3
    outs.extend(pipe.drain())
    assert pipe.in_flight == 0
    assert len(outs) == 6 and pipe.frames_completed == 6
    # state is the running sum of 4*i at each step; outputs in order
    for i, (st, doubled) in enumerate(outs):
        np.testing.assert_allclose(np.asarray(doubled), (i + 1) * 2.0)
        expect_state = 4.0 * sum(range(1, i + 2))
        np.testing.assert_allclose(float(st), expect_state)


def test_frames_ready_walks_forward_on_rounded_end():
    """Fractional hop: a frame whose ROUNDED end-clock is readable must
    count as ready even when the exact product k*hop undershoots it
    (round-3 review: the final frame of an offline stream was withheld
    forever)."""
    from signalizer_tpu.stream.batcher import FrameBatcher

    b = FrameBatcher(1, window=20, hop=10.26, capacity=4096)
    b.push(np.zeros((1, 71), np.float32))
    # frame k ends at int(k*10.26 + 0.5) + 20; k=5 -> 51+20 = 71 <= 71
    assert b.frames_ready() == 6
    frames = b.pull()
    assert frames.shape[0] == 6
