"""A/B: fused Pallas window+rFFT+mag kernel vs the XLA chain vs the
unfused MXU four-step, at the headline geometry (SURVEY §2.8 north star /
§7 step 11; ref transform core: TransformConstant.h:223 pffft).

House discipline: exactness asserted first, then scan-slope timings with
the input rotated per step (hoisting landmine) and a scalar-checksum sync
(lazy-array landmine). Also measures the full spectrum_values pipeline
with the fused front end patched in, so the verdict covers the production
composition, not just the isolated segment.

Run on the TPU rig:  python tools/fused_spectrum_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bench import _scan_rate
    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import host_view, make_spectrum_constant
    from signalizer_tpu.kernels import spectrum as sp
    from signalizer_tpu.kernels.mxu_fft import make_plan, mxu_rfft_half
    from signalizer_tpu.kernels.pallas_spectrum import (
        fused_window_rfft_mag,
        make_fused_plan,
    )

    n = 4096
    constant = make_spectrum_constant(
        axis_points=1024,
        window_size=n,
        sample_rate=48_000.0,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    w = np.asarray(host_view(constant, "window_kernel"), np.float32)
    fplan = make_fused_plan(n, w)
    mplan = make_plan(n)
    wj = jnp.asarray(w)
    half = n // 2 + 1

    def mags_xla(x):
        return jnp.abs(jnp.fft.rfft(x * wj, axis=-1))

    def mags_mxu(x):
        re, im = mxu_rfft_half(mplan, x * wj)
        return jnp.sqrt(re * re + im * im)

    def mags_mxu_high(x):
        # bf16x3 f32 emulation: half the MXU passes of HIGHEST
        re, im = mxu_rfft_half(mplan, x * wj, precision=jax.lax.Precision.HIGH)
        return jnp.sqrt(re * re + im * im)

    def mags_mxu_bf16(x):
        # raw bf16 MXU rounding: fastest, display-grade accuracy only
        re, im = mxu_rfft_half(mplan, x * wj, precision=jax.lax.Precision.DEFAULT)
        return jnp.sqrt(re * re + im * im)

    def mags_fused(x):
        return fused_window_rfft_mag(fplan, x)[..., :half]

    def mags_fused_raw(x):
        # no bin reorder: the integration path composes plan.bin_order
        # into the downstream remap plan, so THIS is the honest kernel
        # cost (checksum only — raw layout is a permutation of the bins)
        return fused_window_rfft_mag(fplan, x, reorder=False)

    def mags_fused_t16(x):
        return fused_window_rfft_mag(fplan, x, tile_b=16, reorder=False)

    variants = {
        "xla": mags_xla,
        "mxu": mags_mxu,
        "mxu_high": mags_mxu_high,
        "mxu_bf16": mags_mxu_bf16,
        "fused": mags_fused,
        "fused_raw": mags_fused_raw,
        "fused_t16": mags_fused_t16,
    }
    # display tolerance: 1e-3 relative is ~0.009 dB on the spectrum view;
    # f32-emulated paths must stay at oracle tolerance
    tol = {"mxu_high": 1e-4, "mxu_bf16": 2e-2}

    # exactness vs float64 numpy
    rng = np.random.default_rng(0)
    x_h = rng.standard_normal((4, 2, n)).astype(np.float32)
    ref = np.abs(np.fft.rfft(x_h.astype(np.float64) * w))
    out = {"n": n, "device": str(jax.devices()[0])}
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(jnp.asarray(x_h)))
        if got.shape[-1] != half:  # raw kernel layout -> natural bins
            got = got[..., np.asarray(fplan.bin_order)]
        rel = float(np.max(np.abs(got - ref)) / np.max(ref))
        out[f"maxrel_{name}"] = round(rel, 10)
        assert rel < tol.get(name, 5e-6), (name, rel)

    # scan-slope timings at the headline batch
    pairs, t_steps = 16, 128
    big = jnp.asarray(
        rng.standard_normal((pairs, t_steps, 2, n)).astype(np.float32)
    )
    frames_per = pairs * t_steps
    for name, fn in variants.items():

        def body(c, fn=fn):
            x, acc = c
            return jnp.roll(x, 1, axis=-1), acc + jnp.sum(fn(x))

        us = _scan_rate(body, (big, jnp.float32(0.0)), k1=8, k2=64)[0] / frames_per * 1e6
        out[f"mag_us_{name}"] = round(us, 4)
        print(f"  mag {name}: {us:.3f} us/frame", file=sys.stderr)

    # full spectrum_values with each front end (window+FFT+mag+remap):
    # patch _half_spectrum's product for the fused variant
    inv = constant.inv_size

    def full_from_mags(mags_fn):
        def fn(f):
            rows = f[..., :2, :]  # SEPARATE packing (window applied inside)
            mags = mags_fn(rows)
            nb = n // 2
            scale = jnp.ones(nb + 1, jnp.float32).at[0].set(0.5).at[nb].set(0.5)
            return jnp.sum(inv * sp._remap_mag(mags * scale, constant))

        return fn

    for name, fn in variants.items():
        if name.startswith("fused_"):
            continue  # raw layouts need a permuted remap plan; mag-only
        f = full_from_mags(fn)

        def body(c, f=f):
            x, acc = c
            return jnp.roll(x, 1, axis=-1), acc + f(x)

        us = _scan_rate(body, (big, jnp.float32(0.0)), k1=8, k2=64)[0] / frames_per * 1e6
        out[f"pipeline_us_{name}"] = round(us, 4)
        print(f"  pipeline {name}: {us:.3f} us/frame", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
