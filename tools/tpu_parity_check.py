"""TPU-vs-CPU numerical parity check.

Runs representative configs of every view on the attached accelerator and
on the host CPU and compares outputs. Guards against backend-specific
lowering differences the CPU test suite cannot see (e.g. segment
reductions exploiting sortedness hints, bf16 MXU accumulation paths) —
the round-1 advisor flagged exactly such a hazard.

Usage: python tools/tpu_parity_check.py
Prints one PASS/FAIL line per check and exits non-zero on failure.
"""

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CHECKS = """
import sys, json
import numpy as np

def run_all():
    import jax
    import jax.numpy as jnp
    from signalizer_tpu.core.config import (
        BinInterpolation, OscChannels, SpectrumChannels, ViewScaling)
    from signalizer_tpu.core.constant import make_spectrum_constant
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state
    from signalizer_tpu.views.oscilloscope import (
        OscilloscopeProcessor, SubSampleInterpolation, TriggerMode)
    from signalizer_tpu.views.vectorscope import VectorscopeProcessor, AutoGain

    rng = np.random.default_rng(42)
    out = {}

    # bin-max heavy spectrum: log scale, many bins per pixel
    c = make_spectrum_constant(
        axis_points=256, window_size=8192, sample_rate=48_000.0,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC)
    frames = rng.standard_normal((2, 3, 2, 8192)).astype(np.float32) * 0.4
    r = analyze_frames(c, init_line_graph_state(c, (2,)), jnp.asarray(frames))
    out["spectrum_binmax"] = np.asarray(r.results)

    # phase mode (argbin path: two segment reductions)
    cp = make_spectrum_constant(
        axis_points=200, window_size=4096, sample_rate=48_000.0,
        configuration=SpectrumChannels.PHASE,
        bin_interpolation=BinInterpolation.LANCZOS,
        view_scaling=ViewScaling.LOGARITHMIC)
    fp = rng.standard_normal((1, 2, 2, 4096)).astype(np.float32) * 0.4
    rp = analyze_frames(cp, init_line_graph_state(cp, (1,)), jnp.asarray(fp))
    out["spectrum_phase"] = np.asarray(rp.results)

    # oscilloscope spectral trigger (FFT search + goertzel + sinc MXU path)
    t = np.arange(16384)
    x = (0.5 * np.sin(2 * np.pi * 441.3 * t / 48_000.0)).astype(np.float32)
    hist = np.broadcast_to(x, (2, 2, 16384)).copy()
    osc = OscilloscopeProcessor(
        pairs=2, channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.SPECTRAL,
        interpolation=SubSampleInterpolation.LANCZOS,
        window_samples=700.0, pixels=512, autogain=True, colour_enabled=True)
    f = osc.process(hist)
    out["osc_wave"] = np.asarray(f.waveform)
    out["osc_colours"] = np.asarray(f.colours)

    # vectorscope meters (closed-form block IIRs)
    vs = VectorscopeProcessor(pairs=2, autogain=AutoGain.RMS)
    vf = vs.process(rng.standard_normal((2, 2, 2048)).astype(np.float32) * 0.3)
    out["vs_vertices"] = np.asarray(vf.vertices)
    out["vs_balance"] = np.asarray(vf.balance)

    # zero-crossing and envelope-hold triggers (segment reductions + scans)
    for name, mode in (("osc_zc", TriggerMode.ZERO_CROSSING),
                       ("osc_hold", TriggerMode.ENVELOPE_HOLD)):
        op = OscilloscopeProcessor(
            pairs=2, channel_mode=OscChannels.LEFT, trigger_mode=mode,
            interpolation=SubSampleInterpolation.LINEAR,
            window_samples=500.0, pixels=256, lookahead=4096,
            trigger_threshold=0.1, trigger_hysteresis=0.2)
        fr = op.process(hist)
        fr = op.process(hist)  # carried trigger state
        out[name] = np.asarray(fr.waveform)

    # spectrogram column pipeline (gradient + blend + quantize)
    from signalizer_tpu.kernels.colormap import normalize_ratios, spectrogram_columns
    from signalizer_tpu.views.spectrogram import DEFAULT_GRADIENT, DEFAULT_RATIOS
    csg = make_spectrum_constant(
        axis_points=128, window_size=1024, sample_rate=48_000.0,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC, display_mode=1)
    fsg = rng.standard_normal((2, 2, 2, 1024)).astype(np.float32) * 0.4
    rsg = analyze_frames(csg, init_line_graph_state(csg, (2,)), jnp.asarray(fsg))
    cols = spectrogram_columns(
        rsg.results[:, :, 0, 0, :],
        jnp.asarray(np.broadcast_to(DEFAULT_GRADIENT, (2, 6, 3)).copy()),
        jnp.asarray(normalize_ratios(DEFAULT_RATIOS), jnp.float32))
    out["spectrogram_cols"] = np.asarray(cols).astype(np.float32) / 255.0

    # resonator bank (complex math strictly inside jit; real-pair
    # boundaries — this rig's transport cannot move complex64 at all)
    from signalizer_tpu.views.spectrum import ResonatorSpectrumProcessor
    from signalizer_tpu.core.config import TransformAlgorithm
    cr = make_spectrum_constant(
        axis_points=128, window_size=2048, sample_rate=48_000.0,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC, algo=TransformAlgorithm.RESONATOR)
    rproc = ResonatorSpectrumProcessor(cr, pairs=1)
    xs = (0.5 * np.sin(2 * np.pi * 1000.0 * t[:8192] / 48_000.0)).astype(np.float32)
    rres = rproc.process(np.stack([xs, xs])[None])
    out["resonator"] = np.asarray(rres)

    return out

import jax
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
res = run_all()
np.savez_compressed(sys.argv[2], **res)
print(jax.devices()[0].platform)
"""


def main():
    import tempfile

    import numpy as np

    with tempfile.TemporaryDirectory() as d:
        outs = {}
        for backend, args in (("device", []), ("cpu", ["cpu"])):
            path = f"{d}/{backend}.npz"
            proc = subprocess.run(
                [sys.executable, "-c", CHECKS, *(args or ["device"]), path],
                capture_output=True,
                text=True,
                cwd=str(pathlib.Path(__file__).resolve().parent.parent),
                timeout=1200,
            )
            if proc.returncode != 0:
                print(f"FAIL {backend} run: {proc.stderr[-500:]}")
                return 1
            platform = proc.stdout.strip().splitlines()[-1]
            print(f"ran on {backend}: platform={platform}")
            outs[backend] = np.load(path)

        dev, cpu = outs["device"], outs["cpu"]
        failures = 0
        DISPLAY_KEYS = {"spectrum_binmax", "spectrum_phase", "resonator"}
        QUANTIZED_KEYS = {"spectrogram_cols"}
        for key in cpu.files:
            a, b = np.asarray(dev[key]), np.asarray(cpu[key])
            if key in QUANTIZED_KEYS:
                # uint8 columns: allow one quantization step
                ok = float(np.max(np.abs(a - b))) <= (1.5 / 255.0)
                print(f"{'PASS' if ok else 'FAIL'} {key}: max abs diff {np.max(np.abs(a-b)):.2e} (u8 steps)")
                failures += 0 if ok else 1
                continue
            if key in DISPLAY_KEYS:
                # display values: compare what the screen shows. Values far
                # below the display floor are log-amplified leakage noise
                # (e.g. the resonator's -160 dB skirt) — invisible, and
                # legitimately backend-dependent at that magnitude
                a = np.clip(a, 0.0, 1.0)
                b = np.clip(b, 0.0, 1.0)
            diff = np.abs(a - b)
            err = float(diff.max()) if a.size else 0.0
            bad_frac = float((diff > 2e-3).mean()) if a.size else 0.0
            # display-space tolerance ~0.1 dB of a 96 dB range, PLUS an
            # allowance for argmax/normalization knife-edges (bin-max ties
            # and colour normalization at near-zero energy legitimately
            # flip between backends): at most 0.5% of elements may exceed it
            ok = err < 2e-3 or bad_frac < 5e-3
            tag = "PASS" if ok else "FAIL"
            print(f"{tag} {key}: max abs diff {err:.2e}, frac>tol {bad_frac:.2e}")
            failures += 0 if ok else 1
        return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
