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
