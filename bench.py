"""Benchmark harness — BASELINE headline metric.

Measures stereo 4096-pt spectrum frames/sec/chip at 48 kHz plus p50 frame
latency (driver BASELINE.json: target >= 1000 frames/s/chip, p50 < 1 ms).
Prints exactly one JSON line.

Methodology:
* throughput: one jitted call analyzes a [pairs, T, 2, 4096] batch
  (T time-sequential hops with peak-decay threading, pairs parallel);
  frames/sec = pairs * T / wall-time, median over repeats.
* latency: single-frame steps with donated state, p50 over repeats —
  includes host->device transfer of the frame and device->host of the
  result row (the full round trip the reference never pays because it
  stays on CPU).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import make_spectrum_constant
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state

    constant = make_spectrum_constant(
        axis_points=1024,
        window_size=4096,
        sample_rate=48_000.0,
        configuration=SpectrumChannels.SEPARATE,  # stereo: both channels out
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )

    @jax.jit
    def batch_step(state, frames):
        r = analyze_frames(constant, state, frames)
        return r.results, r.state

    @jax.jit
    def single_step(state, frame):
        r = analyze_frames(constant, state, frame)
        # display row only (what a renderer would fetch)
        return r.results[:, 0, 0], r.state

    rng = np.random.default_rng(0)

    # ---- throughput: batched frames ---------------------------------------
    pairs, t_steps = 8, 128  # 1024 frames per call
    frames = jnp.asarray(
        rng.standard_normal((pairs, t_steps, 2, constant.window_size)).astype(np.float32)
    )
    state = init_line_graph_state(constant, (pairs,))
    # warmup/compile
    results, state = batch_step(state, frames)
    jax.block_until_ready(results)

    reps = 10
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        results, state = batch_step(state, frames)
        jax.block_until_ready(results)
        times.append(time.perf_counter() - t0)
    frames_per_call = pairs * t_steps
    throughput = frames_per_call / float(np.median(times))

    # ---- latency: single frame round trip ---------------------------------
    lat_state = init_line_graph_state(constant, (1,))
    host_frame = rng.standard_normal((1, 1, 2, constant.window_size)).astype(np.float32)
    row, lat_state = single_step(lat_state, jnp.asarray(host_frame))
    np.asarray(row)

    lats = []
    for _ in range(200):
        t0 = time.perf_counter()
        row, lat_state = single_step(lat_state, jnp.asarray(host_frame))
        np.asarray(row)  # force device->host
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1e3)
    p99_ms = float(np.percentile(lats, 99) * 1e3)

    target = 1000.0  # frames/sec/chip (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "spectrum_frames_per_sec_per_chip_4096pt_stereo",
                "value": round(throughput, 1),
                "unit": "frames/s",
                "vs_baseline": round(throughput / target, 3),
                "p50_latency_ms": round(p50_ms, 4),
                "p99_latency_ms": round(p99_ms, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
