"""Complete op-level attribution of the flagship batch time (VERDICT r3 #2).

ROADMAP r3's stage sum (encode ~1.9 + RZCC ~1.5 + LIF ~2.4 ms) left ~1.4 ms
of the measured 7.2 ms/batch unaccounted.  This harness times nested jitted
PREFIXES of the exact flagship program (same code paths, same layouts) plus
isolated stages with device-resident inputs, so consecutive differences
attribute the whole batch wall time op-by-op:

    encode            = t(encode)
    rzcc              = t(encode+rzcc) - t(encode)
    lif               = t(encode+rzcc+lif) - t(encode+rzcc)
    fold+peak         = t(forward_batch) - t(encode+rzcc+lif)
    matched epilogue  = t(matched) - t(forward_batch)

Every timing is pipelined (block after n dispatches) per CLAUDE.md's tunnel
guidance; inputs are device-resident jit args.

Usage: python experiments/flagship_attribution.py [--batch 96] [--reps 50]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from haghighatshoarmuir2024_tpu import CenterCircularArray  # noqa: E402
from haghighatshoarmuir2024_tpu.models.xylo import Demo  # noqa: E402
from haghighatshoarmuir2024_tpu.models.xylo.pipeline import (  # noqa: E402
    _encode_cumsum,
    _stht_method,
)
from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template  # noqa: E402
from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import lif_count_rates_bipolar  # noqa: E402
from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (  # noqa: E402
    rzcc_encode_bipolar_tm,
)

FS = 48_000


def timeit(fn, args, reps, label):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label:<34s} {dt:7.3f} ms", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--grid", type=int, default=449)
    args = ap.parse_args()
    B = args.batch

    geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)
    demo = Demo(
        geometry=geometry,
        freq_bands=[[1600, 1900]],
        doa_list=np.linspace(-np.pi, np.pi, args.grid),
        recording_duration=0.25,
        kernel_duration=10e-3,
        bipolar_spikes=True,
        fs=FS,
    )
    demo.calibrate_profiles()

    t = np.arange(0, 0.25, 1 / FS)
    sig = np.sin(2 * np.pi * 1750 * t)
    rng = np.random.default_rng(0)
    doas = np.linspace(-np.pi, np.pi, B, endpoint=False)
    frames = np.stack(
        [np.asarray(signal_from_template(geometry, t, sig, float(d), fs=FS)) for d in doas]
    ).astype(np.float32)
    frames += 0.1 * rng.standard_normal(frames.shape).astype(np.float32)
    x = jnp.asarray(frames)

    kernel = np.asarray(demo.beamfs[0].kernel, np.float32)
    bas = demo._bas
    rw = demo.beamfs[0].robust_width
    cfg = demo.xylo_config
    stht_method = _stht_method()

    @jax.jit
    def enc(sig_batch):
        cs_tm = jax.vmap(
            lambda s: _encode_cumsum(s, kernel, bas=bas, stht_method=stht_method, time_major=True),
            out_axes=1,
        )(sig_batch)
        return cs_tm

    @jax.jit
    def enc_rzcc(sig_batch):
        cs_tm = enc(sig_batch)
        T, Bb, C = cs_tm.shape
        kp, kn = rzcc_encode_bipolar_tm(cs_tm.reshape(T, Bb * C), rw, 2 * rw)
        return kp, kn

    @jax.jit
    def enc_rzcc_lif(sig_batch):
        cs_tm = enc(sig_batch)
        T, Bb, C = cs_tm.shape
        kp, kn = rzcc_encode_bipolar_tm(cs_tm.reshape(T, Bb * C), rw, 2 * rw)
        counts = lif_count_rates_bipolar(
            cfg, kp.reshape(T, Bb, C), kn.reshape(T, Bb, C), spike_bound=1
        )
        return counts

    # isolated stages on device-resident stage inputs
    cs_dev = enc(x)
    T, _, C = cs_dev.shape
    rzcc_only = jax.jit(
        lambda cs: rzcc_encode_bipolar_tm(cs.reshape(T, B * C), rw, 2 * rw)
    )
    kp_dev, kn_dev = jax.jit(
        lambda cs: rzcc_encode_bipolar_tm(cs.reshape(T, B * C), rw, 2 * rw)
    )(cs_dev)
    lif_only = jax.jit(
        lambda kp, kn: lif_count_rates_bipolar(
            cfg, kp.reshape(T, B, C), kn.reshape(T, B, C), spike_bound=1
        )
    )

    print(f"== flagship attribution, B={B}, reps={args.reps} ==", file=sys.stderr)
    t_enc = timeit(enc, (x,), args.reps, "encode (STHT+IIR cumsum)")
    t_enc_rzcc = timeit(enc_rzcc, (x,), args.reps, "encode+RZCC")
    t_enc_rzcc_lif = timeit(enc_rzcc_lif, (x,), args.reps, "encode+RZCC+LIF")
    t_fwd = timeit(demo._forward_batch_jit, (x,), args.reps, "forward_batch (peak)")
    t_matched = timeit(
        demo._forward_batch_matched_jit, (x,), args.reps, "forward_batch (matched)"
    )
    t_rzcc_i = timeit(rzcc_only, (cs_dev,), args.reps, "[isolated] RZCC")
    t_lif_i = timeit(lif_only, (kp_dev, kn_dev), args.reps, "[isolated] LIF")

    print("\n== incremental attribution ==")
    print(f"encode                 {t_enc:7.3f} ms")
    print(f"RZCC (in-program)      {t_enc_rzcc - t_enc:7.3f} ms   [isolated {t_rzcc_i:.3f}]")
    print(f"LIF (in-program)       {t_enc_rzcc_lif - t_enc_rzcc:7.3f} ms   [isolated {t_lif_i:.3f}]")
    print(f"fold+argmax epilogue   {t_fwd - t_enc_rzcc_lif:7.3f} ms")
    print(f"matched epilogue       {t_matched - t_fwd:7.3f} ms")
    print(f"TOTAL (matched)        {t_matched:7.3f} ms")
    aud = B * 0.25
    print(f"throughput             {aud / (t_matched / 1e3):7.1f} audio-sec/sec")

    # Drain the tunnel's D2H debt before exiting: this harness dispatches
    # ~900 programs and never fetches results — without a drain the NEXT
    # process's first download pays for all of it (measured 278 s;
    # CLAUDE.md "Axon D2H poison" item 4).
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((), jnp.float32))
    print(f"[tunnel drain {time.perf_counter() - t0:.1f}s]", file=sys.stderr)


if __name__ == "__main__":
    main()
