"""Native host runtime vs the numpy reference implementation."""

import numpy as np
import pytest

from signalizer_tpu.native_bindings import (
    NativeRingBuffer,
    native_available,
    native_build_error,
)
from signalizer_tpu.stream.ring_buffer import RingBuffer

pytestmark = pytest.mark.skipif(
    not native_available(), reason=f"native runtime unavailable: {native_build_error()}"
)


def test_native_matches_python_ring_randomized():
    rng = np.random.default_rng(0)
    py = RingBuffer(3, 64)
    nat = NativeRingBuffer(3, 64)
    for _ in range(50):
        n = int(rng.integers(1, 100))
        block = rng.standard_normal((3, n)).astype(np.float32)
        py.write(block)
        nat.write(block)
        assert nat.sample_clock == py.sample_clock
        for w in (1, 7, 64):
            np.testing.assert_array_equal(nat.latest(w), py.latest(w))


def test_native_read_at_semantics():
    nat = NativeRingBuffer(1, 100)
    nat.write(np.arange(50, dtype=np.float32)[None])
    np.testing.assert_array_equal(nat.read_at(30, 5)[0], [25, 26, 27, 28, 29])
    with pytest.raises(ValueError):
        nat.read_at(60, 5)
    small = NativeRingBuffer(1, 8)
    small.write(np.arange(20, dtype=np.float32)[None])
    with pytest.raises(ValueError):
        small.read_at(5, 4)


def test_native_zero_padding_when_underfilled():
    nat = NativeRingBuffer(2, 16)
    nat.write(np.ones((2, 4), np.float32))
    out = nat.latest(8)
    np.testing.assert_array_equal(out[:, :4], 0.0)
    np.testing.assert_array_equal(out[:, 4:], 1.0)


def test_native_frame_gather_matches_read_at():
    nat = NativeRingBuffer(2, 256)
    data = np.arange(200, dtype=np.float32)
    nat.write(np.stack([data, -data]))
    frames = nat.frame_gather(0, 10, 16.0, 32)
    assert frames.shape == (10, 2, 32)
    for k in range(10):
        np.testing.assert_array_equal(frames[k], nat.read_at(16 * k + 32, 32))
    np.testing.assert_array_equal(frames[:, 1], -frames[:, 0])


def test_native_mix_accumulate():
    nat = NativeRingBuffer(2, 64)
    blk = np.zeros((2, 32), np.float32)
    blk[1] = 2.0
    nat.write(blk)
    dst = np.ones(16, np.float32)
    assert nat.mix_accumulate(32, 1, dst)
    np.testing.assert_array_equal(dst, 3.0)
    # out-of-range channel contributes silence, returns False, no crash
    dst2 = np.zeros(16, np.float32)
    assert not nat.mix_accumulate(32, 5, dst2)
    np.testing.assert_array_equal(dst2, 0.0)


def test_native_oversized_write():
    nat = NativeRingBuffer(1, 4)
    nat.write(np.arange(10, dtype=np.float32)[None])
    np.testing.assert_array_equal(nat.latest(4)[0], [6, 7, 8, 9])


def test_native_latest_rejects_bad_out_buffer():
    """A wrong-shape/dtype caller buffer must not reach the native writer
    (regression: heap corruption via undersized raw pointer)."""
    ring = NativeRingBuffer(2, 32)
    ring.write(np.arange(64, dtype=np.float32).reshape(2, 32))
    small = np.zeros((2, 4), np.float32)  # undersized
    out = ring.latest(16, out=small)
    assert out.shape == (2, 16)
    assert out is not small
    f64 = np.zeros((2, 16), np.float64)  # wrong dtype
    out2 = ring.latest(16, out=f64)
    assert out2.dtype == np.float32 and out2 is not f64
    good = np.zeros((2, 16), np.float32)
    out3 = ring.latest(16, out=good)
    assert out3 is good
    np.testing.assert_array_equal(out, out3)


def test_native_packet_queue_spsc_semantics():
    """Wait-free pushes, blocking pops, FIFO order, drop accounting, and
    playhead metadata round-trip (readerwriterqueue analogue)."""
    import threading

    from signalizer_tpu.native_bindings import NativePacketQueue

    q = NativePacketQueue(2, 64, capacity=8)
    got = []
    done = threading.Event()

    def consumer():
        while True:
            try:
                item = q.pop(timeout_ms=100)
            except StopIteration:
                done.set()
                return
            if item is not None:
                got.append(item)

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(20):
        blk = np.full((2, 32), float(i), np.float32)
        q.push(blk, position=i * 32, steady=i * 32 + 7, bpm=100.0 + i, playing=(i % 2 == 0),
               end_clock=(i + 1) * 32, generation=3)
    # wait for drain, then close
    deadline = 50
    while q.size > 0 and deadline:
        import time as _t

        _t.sleep(0.01)
        deadline -= 1
    q.close()
    t.join(timeout=2)
    assert done.is_set()
    assert len(got) + q.dropped == 20
    # FIFO order and faithful metadata
    positions = [g[1] for g in got]
    assert positions == sorted(positions)
    blk, pos, steady, bpm, playing, end_clock, gen = got[0]
    i0 = pos // 32
    assert steady == i0 * 32 + 7 and bpm == 100.0 + i0 and playing == (i0 % 2 == 0)
    assert end_clock == (i0 + 1) * 32 and gen == 3  # ring-clock stamp round-trip
    np.testing.assert_array_equal(blk, np.full((2, 32), float(i0), np.float32))


def test_threaded_audio_stream_uses_native_queue_and_packetizes():
    """The threaded AudioStream rides the native SPSC queue and splits
    large blocks at STREAM_PACKET_SIZE (ref: AudioStream<float, 256>)."""
    from signalizer_tpu.core.config import STREAM_PACKET_SIZE
    from signalizer_tpu.stream.audio_stream import AudioStream, AudioStreamInfo, Playhead

    inp, out = AudioStream.create(
        threaded=True, info=AudioStreamInfo(channels=2, audio_history_capacity=8192)
    )
    stream = out._stream
    assert stream._native_queue is not None  # native path active
    blocks = []

    class L:
        def on_stream_audio(self, ctx, block):
            blocks.append((block.copy(), ctx.playhead.steady_clock, ctx.playhead.bpm))

        def on_stream_properties_changed(self, ctx, before): ...

        def on_stream_died(self, ctx): ...

    out.add_listener(L())
    big = np.arange(2 * 1000, dtype=np.float32).reshape(2, 1000)
    inp.process_incoming_audio(big, Playhead(steady_clock=500, bpm=133.0, is_playing=True))
    assert stream.wait_for_drain()
    # 1000 samples -> ceil(1000/256) = 4 packets with correct clocks
    assert len(blocks) == 4
    sizes = [b[0].shape[1] for b in blocks]
    assert sizes == [STREAM_PACKET_SIZE] * 3 + [1000 - 3 * STREAM_PACKET_SIZE]
    clocks = [b[1] for b in blocks]
    assert clocks == [500, 756, 1012, 1268]
    assert all(b[2] == 133.0 for b in blocks)
    # reassembled audio matches the input
    np.testing.assert_array_equal(np.concatenate([b[0] for b in blocks], axis=1), big)
    stream.close()


def test_threaded_stream_channel_change_recreates_queue():
    """Changing the stream's channel count must rebuild the native packet
    queue (its slot geometry is channel-bound; stale geometry would make
    the native copy read out of bounds)."""
    from signalizer_tpu.stream.audio_stream import AudioStream, AudioStreamInfo

    inp, out = AudioStream.create(
        threaded=True, info=AudioStreamInfo(channels=2, audio_history_capacity=4096)
    )
    stream = out._stream
    q_before = stream._native_queue
    assert q_before is not None and q_before.channels == 2
    inp.initialize_info(lambda info: setattr(info, "channels", 4))
    assert stream._native_queue is not q_before
    assert stream._native_queue.channels == 4
    # audio flows through the new geometry
    inp.process_incoming_audio(np.ones((4, 300), np.float32))
    assert stream.wait_for_drain()
    np.testing.assert_array_equal(out.get_history(4)[..., -1], np.ones(4))
    stream.close()


def test_double_geometry_swap_drains_intermediate_queue():
    """Two quick geometry swaps with packets pushed to the intermediate
    queue: the worker must walk the swap chain in order, or those packets
    strand and wait_for_drain times out forever (advisor finding,
    round 3). A blocking listener holds the worker inside the FIRST
    queue's delivery while both swaps happen."""
    import threading

    from signalizer_tpu.stream.audio_stream import (
        AudioStream,
        AudioStreamInfo,
        StreamListener,
    )

    gate = threading.Event()
    entered = threading.Event()
    seen = []

    class Blocking(StreamListener):
        def on_stream_audio(self, ctx, block):
            entered.set()
            gate.wait(timeout=10)
            seen.append(block.shape)

    inp, out = AudioStream.create(
        threaded=True, info=AudioStreamInfo(channels=2, audio_history_capacity=4096)
    )
    stream = out._stream
    out.add_listener(Blocking())
    # worker blocks inside delivery of the first packet (queue A)
    inp.process_incoming_audio(np.ones((2, 256), np.float32))
    assert entered.wait(timeout=5)
    # swap A -> B, push into B while the worker is still stuck in A
    inp.initialize_info(lambda info: setattr(info, "channels", 4))
    q_b = stream._native_queue
    inp.process_incoming_audio(np.ones((4, 256), np.float32) * 2)
    # swap B -> C, push into C
    inp.initialize_info(lambda info: setattr(info, "channels", 6))
    assert stream._native_queue is not q_b
    inp.process_incoming_audio(np.ones((6, 256), np.float32) * 3)
    gate.set()
    # every pushed packet must deliver (B's packet included)
    assert stream.wait_for_drain(timeout=5)
    assert sorted(s[0] for s in seen) == [2, 4, 6]
    stream.close()
