"""Device-resident history ring: oracle + FrameBatcher parity.

The ring re-implements the reference's read-windows-in-place discipline
(ref: TransformDSP.inl:38-231 prepareTransform over AudioBufferViews;
SpectrumRendering.cpp:620-635) as a device shift ring with hop-only
uploads; tests pin the update algebra against a plain numpy stream oracle
and the emitted frames against the host FrameBatcher.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signalizer_tpu.stream.batcher import FrameBatcher
from signalizer_tpu.stream.device_ring import (
    DeviceFrameSource,
    extract_frames,
    ingest_window,
    ring_ingest,
    ring_update,
)


def test_ring_update_matches_stream_tail_oracle():
    """After any sequence of bucketed ingests, the ring holds exactly the
    last H samples of the (zero-prefixed) stream."""
    rng = np.random.default_rng(0)
    h = 64
    ring = jnp.zeros((2, h), jnp.float32)
    stream = np.zeros((2, 0), np.float32)
    for n_valid, n_max in [(3, 8), (8, 8), (1, 4), (17, 32), (70, 128)]:
        block = rng.standard_normal((2, n_valid)).astype(np.float32)
        stream = np.concatenate([stream, block], axis=-1)
        padded = np.zeros((2, n_max), np.float32)
        padded[:, :n_valid] = block
        ring = ring_ingest(ring, jnp.asarray(padded), jnp.int32(n_valid))
        tail = np.zeros((2, h), np.float32)
        take = min(h, stream.shape[-1])
        if take:
            tail[:, h - take :] = stream[:, -take:]
        np.testing.assert_array_equal(np.asarray(ring), tail)


def test_extract_frames_matches_manual_windows():
    rng = np.random.default_rng(1)
    h, window, hop, t_max = 100, 16, 4, 5
    ring = rng.standard_normal((3, h)).astype(np.float32)
    frames = jax.jit(lambda r: extract_frames(r, window, hop, t_max, frame_axis=-2))(
        jnp.asarray(ring)
    )
    assert frames.shape == (3, t_max, window)
    for k in range(t_max):
        end = h - (t_max - 1 - k) * hop
        np.testing.assert_array_equal(
            np.asarray(frames)[:, k], ring[:, end - window : end]
        )


def test_extract_frames_rejects_short_history():
    with pytest.raises(ValueError, match="too short"):
        extract_frames(jnp.zeros((4, 32)), window=16, hop=8, t_max=4)


def test_ingest_window_returns_newest_window():
    ring = jnp.zeros((1, 32), jnp.float32)
    new = jnp.arange(8, dtype=jnp.float32)[None]
    ring, win = ingest_window(ring, new, window=16)
    expect = np.zeros((1, 16), np.float32)
    expect[0, 8:] = np.arange(8)
    np.testing.assert_array_equal(np.asarray(win), expect)


@pytest.mark.parametrize("push_sizes", [[256] * 40, [100, 3, 700, 41, 1024, 2000]])
@pytest.mark.parametrize("window,hop", [(64, 16), (48, 20), (32, 48)])
def test_source_frames_match_frame_batcher(push_sizes, window, hop):
    """The device path emits exactly the host FrameBatcher's frames (same
    windows, same order) for any integer hop — overlapped (hop < window),
    unaligned (window % hop != 0), and gapped (hop > window)."""
    rng = np.random.default_rng(2)
    src = DeviceFrameSource((2,), window, hop, t_cap=8)
    bat = FrameBatcher(2, window, hop, capacity=1 << 16)
    ring = src.init_ring()
    got = []
    for n in push_sizes:
        block = rng.standard_normal((2, n)).astype(np.float32)
        src.push(block)
        bat.push(block)
        for unit in src.pull_uploads():
            ring = ring_ingest(ring, jnp.asarray(unit.samples), jnp.int32(unit.n_valid))
            t_max = unit.frame_valid.shape[0]
            frames = extract_frames(ring, window, hop, t_max, frame_axis=-2)
            got.append(np.asarray(frames)[:, unit.frame_valid])
    device_frames = (
        np.concatenate(got, axis=1) if got else np.zeros((2, 0, window), np.float32)
    )
    ref_frames = bat.pull()  # [T, C, W]
    assert ref_frames.shape[0] == device_frames.shape[1]
    np.testing.assert_allclose(
        device_frames.transpose(1, 0, 2), ref_frames, rtol=0, atol=0
    )


def test_source_prime_then_hops():
    """First upload is exactly `window` samples (frame 0); later uploads
    are whole hops, so the ring end always sits on the frame grid."""
    window, hop = 32, 8
    src = DeviceFrameSource((1,), window, hop, t_cap=4)
    src.push(np.arange(1, 31, dtype=np.float32)[None])  # 30 < window
    assert src.frames_ready() == 0 and src.pull_uploads() == []
    src.push(np.arange(31, 51, dtype=np.float32)[None])  # clock 50
    # frames end at 32, 40, 48 -> 3 ready
    assert src.frames_ready() == 3
    units = src.pull_uploads()
    assert units[0].n_valid == window and units[0].t_valid == 1
    assert sum(u.t_valid for u in units) == 3
    assert src._pending_n == 2  # residue past frame end 48


def test_source_residual_hop_held_back():
    src = DeviceFrameSource((1,), 16, 8, t_cap=4)
    src.push(np.ones((1, 28), np.float32))  # frame ends 16, 24; residue 4
    units = src.pull_uploads()
    assert sum(u.t_valid for u in units) == 2
    assert src._pending_n == 4
    src.push(np.ones((1, 4), np.float32))  # completes the next hop
    assert src.frames_ready() == 1


def test_source_max_frames_and_t_cap_chunking():
    src = DeviceFrameSource((1,), 16, 4, t_cap=4)
    src.push(np.zeros((1, 16 + 4 * 10), np.float32))  # 11 frames ready
    units = src.pull_uploads(max_frames=9)
    assert [u.t_valid for u in units] == [1, 4, 4]  # prime + chunks
    assert src.frames_ready() == 2


def test_source_pending_cap_drops_and_reprimes():
    src = DeviceFrameSource((1,), 16, 4, t_cap=4, max_pending_frames=8)
    src.push(np.zeros((1, 500), np.float32))
    assert src.dropped_frames > 0
    assert not src._primed
    units = src.pull_uploads()  # re-primes with a fresh full window
    assert units[0].n_valid == 16 and units[0].t_valid == 1


def test_non_pow2_t_cap_full_pull_extracts():
    """pull_uploads buckets t_valid to the next pow2, so a non-pow2 t_cap
    must still size the ring for the full bucket (round-4 review: t_cap=5
    produced a t_max=8 unit extract_frames could not serve)."""
    window = hop = 64
    src = DeviceFrameSource((1,), window, hop, t_cap=5)
    x = np.arange(window + 7 * hop, dtype=np.float32)[None]
    src.push(x)
    ring = src.init_ring()
    got = []
    for unit in src.pull_uploads():
        ring = ring_ingest(ring, jnp.asarray(unit.samples), jnp.int32(unit.n_valid))
        frames = extract_frames(ring, window, hop, unit.frame_valid.shape[0])
        got.append(np.asarray(frames)[:, unit.frame_valid])
    got = np.concatenate(got, axis=1)
    assert got.shape[1] == 8
    for k in range(8):
        np.testing.assert_array_equal(got[:, k], x[:, k * hop : k * hop + window])


def test_overload_drop_keeps_absolute_frame_grid():
    """After an overload drop the source must stay on FrameBatcher's
    absolute k*hop grid (round-4 review: re-priming at an arbitrary
    offset phase-shifted every later frame) and count exactly the grid
    frames whose data fell into the gap."""
    window, hop = 32, 8
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 4000)).astype(np.float32)
    src = DeviceFrameSource((1,), window, hop, t_cap=4, max_pending_frames=4)
    ring = src.init_ring()
    emitted = []  # (absolute frame index, [C, W] window)
    pos = 0
    for n in (300, 1500, 37, 900, 1263):  # big pushes overflow the cap
        src.push(x[:, pos : pos + n])
        pos += n
        k = src._next_frame
        for unit in src.pull_uploads(max_frames=3):  # slow consumer
            ring = ring_ingest(ring, jnp.asarray(unit.samples), jnp.int32(unit.n_valid))
            frames = extract_frames(ring, window, hop, unit.frame_valid.shape[0])
            valid = np.asarray(frames)[:, unit.frame_valid]
            for j in range(unit.t_valid):
                emitted.append((k, valid[:, j]))
                k += 1
    assert src.dropped_frames > 0
    # every emitted frame sits on the absolute grid with exact contents
    for k, frame in emitted:
        np.testing.assert_array_equal(frame, x[:, k * hop : k * hop + window])
    # the dropped counter accounts for exactly the skipped grid indices
    assert src._next_frame == src.frames_produced + src.dropped_frames
    ks = [k for k, _ in emitted]
    assert ks == sorted(ks) and len(set(ks)) == len(ks)


def test_source_rejects_fractional_hop():
    with pytest.raises(ValueError, match="integer hop"):
        DeviceFrameSource((1,), 64, 10.5)


def test_spectrogram_device_ingest_matches_host_path():
    """SpectrogramProcessor(device_ingest=True) must emit bit-identical
    RGBA columns to the host-batcher path across multiple pulls (decay
    state threads identically because the extracted windows are exact)."""
    from signalizer_tpu.views.spectrogram import SpectrogramProcessor

    kw = dict(
        pairs=2,
        blob_ms=16.0,  # 768 samples at 48 kHz — integer hop
        axis_points=64,
        window_size=1024,
        sample_rate=48_000.0,
    )
    host = SpectrogramProcessor(**kw)
    dev = SpectrogramProcessor(device_ingest=True, **kw)
    assert dev._source.hop == 768
    rng = np.random.default_rng(7)
    for n in [500, 1300, 257, 4096, 900, 2048]:
        block = rng.standard_normal((4, n)).astype(np.float32) * 0.3
        host.push(block)
        dev.push(block)
        ch = host.pull()
        cd = dev.pull()
        assert ch.shape == cd.shape
        np.testing.assert_array_equal(ch, cd)
    np.testing.assert_array_equal(host.image.snapshot(), dev.image.snapshot())


def test_spectrogram_device_ingest_respects_max_frames_and_pacer():
    from signalizer_tpu.views.spectrogram import ColumnPacer, SpectrogramProcessor

    sp = SpectrogramProcessor(
        device_ingest=True,
        pairs=1,
        blob_ms=16.0,
        axis_points=32,
        window_size=512,
        sample_rate=48_000.0,
    )
    sp.pacer = ColumnPacer(smoothing=0.0)  # consume availability each tick
    rng = np.random.default_rng(8)
    sp.push(rng.standard_normal((2, 768 * 6 + 512), np.float32).astype(np.float32))
    first = sp.pull(max_frames=2)
    assert first.shape[0] == 2
    rest = sp.pull()  # pacer-driven
    assert rest.shape[0] >= 1
