"""TPU rematch: fused Pallas banded resample vs the XLA banded path.

Times both production formulations at cfg3 display geometry
(16 pairs x 2 rows x 8192 px from 16384-sample history, Lanczos a=10)
by scan-chain slope with a scalar-checksum sync (see bench.py — array
block_until_ready can return lazily on this transport).

    python tools/resample_bench.py

Refresh kernels/pallas_resample.py's docstring table from this output.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from signalizer_tpu.kernels.oscilloscope import _banded_resample
    from signalizer_tpu.kernels.pallas_resample import fused_banded_resample

    print(f"device: {jax.devices()[0]}", flush=True)

    pairs, rows, h, pixels, a = 16, 2, 16384, 8192, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((pairs, rows, h)).astype(np.float32))
    start = jnp.asarray(rng.uniform(0, h - 1100, pairs).astype(np.float32))
    step = jnp.float32(1023.0 / (pixels - 1))
    pos = start[:, None] + jnp.arange(pixels, dtype=jnp.float32) * step

    def scan_rate(body, init_carry, k1=8, k2=64, reps=5):
        @functools.partial(jax.jit, static_argnames="length")
        def run(carry, length):
            out = lax.scan(lambda c, _: (body(c), None), carry, None, length=length)[0]
            return out[-1]  # scalar checksum — demonstrably waits

        for k in (k1, k2):
            float(run(init_carry, k))

        def med(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(init_carry, k))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[reps // 2]

        return max((med(k2) - med(k1)) / (k2 - k1), 1e-9)

    def xla_body(c):
        xx, p, acc = c
        w = _banded_resample(xx, p[:, None, :], a, 64, "lanczos")
        return jnp.roll(xx, 1, axis=-1), p + 1.0, acc + jnp.sum(w)

    def pallas_body(c):
        xx, p, acc = c
        w = fused_banded_resample(xx, p, a=a, kind="lanczos")
        return jnp.roll(xx, 1, axis=-1), p + 1.0, acc + jnp.sum(w)

    # old env_os==1 production pair: fused lanczos + a second full banded
    # pass for the nearest envelope pick (round-4 verdict #5 baseline)
    def two_pass_body(c):
        xx, p, acc = c
        w = fused_banded_resample(xx, p, a=a, kind="lanczos")
        n = _banded_resample(xx, p[:, None, :], 1, 64, "nearest")
        return jnp.roll(xx, 1, axis=-1), p + 1.0, acc + jnp.sum(w) + jnp.sum(n)

    # old env_os==1 production pair as actually routed on TPU: BOTH
    # passes were the Pallas kernel (lanczos + nearest invocations)
    def two_pallas_body(c):
        xx, p, acc = c
        w = fused_banded_resample(xx, p, a=a, kind="lanczos")
        n = fused_banded_resample(xx, p, a=1, kind="nearest")
        return jnp.roll(xx, 1, axis=-1), p + 1.0, acc + jnp.sum(w) + jnp.sum(n)

    # new: one kernel invocation, both outputs
    def dual_body(c):
        xx, p, acc = c
        w, n = fused_banded_resample(xx, p, a=a, kind="lanczos", with_nearest=True)
        return jnp.roll(xx, 1, axis=-1), p + 1.0, acc + jnp.sum(w) + jnp.sum(n)

    init = (x, pos, jnp.float32(0.0))
    for name, body in (
        ("xla banded (64)", xla_body),
        ("pallas fused", pallas_body),
        ("pallas + nearest 2pass", two_pass_body),
        ("2x pallas (old env pair)", two_pallas_body),
        ("pallas dual-output", dual_body),
    ):
        dt = scan_rate(body, init)
        print(f"{name:24s} {dt * 1e3:8.3f} ms/step", flush=True)

    # parity spot check on-device
    w_x = _banded_resample(x, pos[:, None, :], a, 64, "lanczos")
    w_p = fused_banded_resample(x, pos, a=a, kind="lanczos")
    err = float(jnp.max(jnp.abs(w_x - w_p)))
    print(f"max |xla - pallas| = {err:.2e}", flush=True)
    w_d, n_d = fused_banded_resample(x, pos, a=a, kind="lanczos", with_nearest=True)
    n_x = _banded_resample(x, pos[:, None, :], 1, 64, "nearest")
    print(
        f"dual: |wave - single| = {float(jnp.max(jnp.abs(w_d - w_p))):.2e}"
        f"  |near - banded| = {float(jnp.max(jnp.abs(n_d - n_x))):.2e}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
