"""Flagship benchmark: throughput of the full encode→SNN→DoA pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec", "vs_baseline": N}

Metric definition (BASELINE.json): audio seconds processed per wall-clock
second per chip by the complete quantized 7-mic Hilbert-SNN localization
pipeline (STHT → filterbank → RZCC encode → integer-LIF SNN → rate → DoA).
Baseline = 1x real-time (the reference's XyloSim path is slower than
real-time on a host CPU, SURVEY §6.4), so vs_baseline == value.

Config matches the reference live demo defaults
(micloc/xylo_snn_localization.py:685-741): CenterCircularArray 7 mics r=4.5cm,
one band, 0.25 s frames, 10 ms kernel, fs 48 kHz, 449-point DoA grid.
"""
import json
import sys
import time

import numpy as np


def _probe_device(timeout_s: float = 300.0) -> bool:
    """Fail fast if the device backend is unreachable (a dead axon tunnel
    hangs jax.devices() forever — measured in round 3).  Probes in a
    subprocess so the hang is bounded and this process's backend stays
    uninitialized."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    if not _probe_device():
        print(
            json.dumps(
                {
                    "metric": "audio-sec/sec/chip full encode->SNN->DoA pipeline (7-mic Hilbert-SNN, 449-DoA grid, matched estimator)",
                    "value": 0.0,
                    "unit": "audio-sec/sec",
                    "vs_baseline": 0.0,
                    "error": "device backend unreachable (tunnel down?)",
                }
            )
        )
        print(
            "# ERROR: jax.devices() did not come up within 300 s — the TPU "
            "tunnel is unreachable; no measurement possible on this host "
            "right now (see CLAUDE.md / RESULTS.md for recorded numbers)",
            file=sys.stderr,
        )
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from haghighatshoarmuir2024_tpu import CenterCircularArray
    from haghighatshoarmuir2024_tpu.models.xylo import Demo
    from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template
    from haghighatshoarmuir2024_tpu.utils.cache import prime_transfers

    # Pay the axon tunnel's first-D2H stall NOW and report it as its own
    # stage: the stall is a tunnel-server pathology (measured 1-430 s,
    # varies with server state; it also blocks ALL other transfers while in
    # flight) — r3's "compile 270 s" was this stall hiding inside lowering
    # via a device-array closure.  See CLAUDE.md + RESULTS.md cold-start
    # section.
    print(
        "# priming axon tunnel (first-D2H; pays any server-side debt left by "
        "earlier processes — can stall 1-900+ s, see RESULTS.md cold-start "
        "section; drain up front with `python -m "
        "haghighatshoarmuir2024_tpu.utils.cache`)...",
        file=sys.stderr,
        flush=True,
    )
    t0p = time.time()
    prime_transfers()
    primer_time = time.time() - t0p

    # HM2024_BENCH_FS=24000 runs the measured-transparent reduced-rate
    # variant (experiments/reduced_rate.py: matched MAE within MC noise of
    # 48 kHz; 12 kHz is refuted).  The driver's headline stays the
    # reference-exact 48 kHz config.
    fs = int(os.environ.get("HM2024_BENCH_FS", "48000"))
    frame = 0.25
    num_grid = 64 * 7 + 1
    geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)

    t0 = time.time()
    demo = Demo(
        geometry=geometry,
        freq_bands=[[1600, 1900]],
        doa_list=np.linspace(-np.pi, np.pi, num_grid),
        recording_duration=frame,
        kernel_duration=10e-3,
        bipolar_spikes=True,
        fs=fs,
    )
    design_time = time.time() - t0

    # batch of audio frames (sources at assorted DoAs + noise)
    t = np.arange(0, frame, 1 / fs)
    sig = np.sin(2 * np.pi * 1750 * t)
    # single-chip throughput sweet spot (measured sweep 64/80/96/112/128:
    # 2980/3258/3462/3393/3273 audio-sec/sec) — B=96 balances the LIF's
    # (B, 512) VPU tiles against the RZCC row-tile padding
    batch_size = 96
    doas = np.linspace(-np.pi, np.pi, batch_size, endpoint=False)
    # ONE vmapped synthesis call: the per-DoA eager loop cost ~96 tunnel
    # round-trips (~20 s hiding inside the "compile" phase, round 5)
    frames = np.asarray(
        jax.jit(
            jax.vmap(lambda d: signal_from_template(geometry, t, sig, d, fs=fs))
        )(jnp.asarray(doas))
    ).astype(np.float32)
    # numpy RNG: a jax.random.normal here compiled an extra program AND
    # downloaded 32 MB device->host inside the "compile" phase (pure
    # measurement noise through the axon tunnel's slow mode)
    frames = frames + 0.1 * np.random.default_rng(0).standard_normal(
        frames.shape
    ).astype(np.float32)
    frames_j = jnp.asarray(frames)

    # matched-profile calibration (cached with the design, so amortized):
    # the flagship ships the bias-free estimator, not the reference's warped
    # argmax (VERDICT r1 weak #3)
    t0c = time.time()
    demo.calibrate_profiles()
    calib_time = time.time() - t0c

    # warm-up / compile — ONE program: the matched forward returns the folded
    # rate profile too, so the reference-parity peak estimate is its argmax
    # (no second near-identical compile; VERDICT r3 directive 1)
    doa, rate = demo.forward_batch(frames_j, method="matched")
    doa.block_until_ready()
    compile_time = time.time() - t0 - design_time - calib_time
    doa_peak = np.asarray(demo.doa_list)[np.argmax(np.asarray(rate), axis=-1)]

    # timed runs — the full flagship program including the matched estimator
    # (time the jitted callable itself; the Python convenience wrapper is not
    # part of the compiled pipeline)
    fn = demo._forward_batch_matched_jit
    # enough pipelined reps to amortize the host<->device round-trip (the
    # axon tunnel costs ~24 ms per blocking sync; at 10 reps that inflates
    # per-batch time by ~2.4 ms)
    n_rep = 100
    t1 = time.time()
    for _ in range(n_rep):
        doa, rate = fn(frames_j)
    doa.block_until_ready()
    elapsed = (time.time() - t1) / n_rep
    if elapsed < 1e-3:
        # tunnel glitch guard: a pipelined block_until_ready has been seen
        # returning early through the axon proxy, reporting ~0 ms/batch.
        # Re-measure with a per-call barrier (upper bound: adds one host
        # round-trip per call, so the reported number stays conservative).
        t1 = time.time()
        for _ in range(n_rep):
            doa, rate = fn(frames_j)
            doa.block_until_ready()
        elapsed = (time.time() - t1) / n_rep

    audio_sec = batch_size * frame
    throughput = audio_sec / elapsed

    # sanity gate: matched estimates must land within a few grid steps
    # (grid step = 360/449 ≈ 0.8°; gate 5°), reference-parity peak reported too
    def ok_frac(est, tol_deg):
        err = np.abs(np.arcsin(np.abs(np.sin(np.asarray(est) - doas))))
        return float(np.mean(np.rad2deg(err) < tol_deg))

    ok_matched = ok_frac(doa, 5.0)
    ok_peak = ok_frac(doa_peak, 25.0)

    metric = (
        "audio-sec/sec/chip full encode->SNN->DoA pipeline "
        "(7-mic Hilbert-SNN, 449-DoA grid, matched estimator)"
    )
    if fs != 48_000:
        metric += f" [reduced-rate variant fs={fs}]"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(throughput, 2),
                "unit": "audio-sec/sec",
                "vs_baseline": round(throughput, 2),
            }
        )
    )
    print(
        f"# primer {primer_time:.1f}s (axon first-D2H stall, tunnel-server pathology), "
        f"design {design_time:.1f}s, calib {calib_time:.1f}s, compile {compile_time:.1f}s, "
        f"batch {batch_size} x {frame}s frames in {elapsed*1000:.1f} ms, "
        f"doa-ok-frac {ok_matched:.2f} @5deg (matched), "
        f"{ok_peak:.2f} @25deg (reference-parity peak)",
        file=sys.stderr,
    )
    if ok_matched < 1.0:
        print("# WARNING: matched accuracy gate failed", file=sys.stderr)

    # Drain the tunnel's D2H debt before exiting so the NEXT process (a
    # bench rerun, the driver's next step) doesn't inherit a multi-minute
    # primer: a bench run without this was measured to leave 368 s of debt
    # (CLAUDE.md "Axon D2H poison" item 4).
    t0d = time.time()
    np.asarray(jnp.zeros((), jnp.float32))
    print(f"# exit drain {time.time() - t0d:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
