"""VPU roofline for the two sequential hot kernels + the k-step LIF attempt
(VERDICT r4 directive 2).

Round 4 asserted "the LIF is VPU-throughput-bound" without a number.  This
harness produces the numbers:

1. **Measured VPU peak** — a Pallas microkernel running the exact LIF op mix
   (arithmetic-shift, subtract, add, compare, select) on register-resident
   (B, 512) i32 values, no loads/stores in the loop: the speed-of-light for
   this op mix on THIS chip.  Using a measured ceiling avoids guessing the
   clock/ALU-width spec through the axon tunnel.

2. **LIF kernel achieved throughput** — the production bipolar count kernel
   (ops/pallas/lif_kernel.py) at flagship shapes (B=96, N_pad=512,
   T=12000, dash=2, thr=127, rec_coef=0, no_sat): 11 arithmetic ops per
   element-step (2 shifts, 3 adds/subs in the two integrators, 1 compare,
   1 select-subtract pair, 1 mask-to-int, 1 count add) plus ~6 VMEM
   ref accesses (isyn/vmem/cnt load+store).

3. **k-step lifting attempt** — the decay+integrate update is affine
   between threshold checks (the IIR modal-lifting trick, ops/iir.py), but
   over the INTEGERS the bitshift decay has value-dependent floor rounding,
   so exact k-step composition still computes every shift.  What k-step
   fusion CAN remove is state traffic: processing k=2/4 steps per unrolled
   iteration keeps isyn/vmem in registers across the pair and loads/stores
   them once per k steps (~6 -> 6/k VMEM accesses per step).  This file
   implements that variant verbatim and measures it.

4. **Suppression kernel achieved throughput** — the fused bipolar RZCC
   encode (ops/pallas/suppress_kernel.py) at flagship shapes; its inner
   work is shift-max chains (sublane shifts + max) over (T, 1344) f32.

Usage: python experiments/vpu_roofline.py [--reps 50] [--batch 96]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from haghighatshoarmuir2024_tpu import CenterCircularArray  # noqa: E402
from haghighatshoarmuir2024_tpu.models.xylo import Demo  # noqa: E402
from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template  # noqa: E402
from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import (  # noqa: E402
    _fit_time_chunk,
    _round_up,
    lif_count_rates_bipolar,
)
from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (  # noqa: E402
    rzcc_encode_bipolar_tm,
)

FS = 48_000


def timeit(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# ------------------------------------------------------------ 1. VPU peak
def _peak_kernel(x_ref, o_ref, *, iters: int, unroll: int):
    """LIF-mix ALU microbench: per iteration 2 shifts + 3 add/sub + 1 cmp +
    1 select-sub + 1 cast-add = 9 ops/elem, all register-resident."""
    x = x_ref[:]
    isyn = x
    vmem = x + 1
    cnt = jnp.zeros_like(x)

    def body(i, carry):
        isyn, vmem, cnt = carry
        # Mosaic only lowers unroll=1 / full-unroll fori_loops; unroll by
        # hand with a Python loop inside an unroll=1 outer loop.
        for _ in range(unroll):
            isyn = isyn - jax.lax.shift_right_arithmetic(isyn, 2) + x  # 3 ops
            vmem = vmem - jax.lax.shift_right_arithmetic(vmem, 2) + isyn  # 3 ops
            fired = vmem >= 127  # 1 op
            vmem = jnp.where(fired, vmem - 127, vmem)  # 2 ops
            cnt = cnt + fired.astype(jnp.int32)  # 1 op (cast fused)
        return isyn, vmem, cnt

    assert iters % unroll == 0
    isyn, vmem, cnt = jax.lax.fori_loop(
        0, iters // unroll, body, (isyn, vmem, cnt), unroll=1
    )
    o_ref[:] = isyn + vmem + cnt


def vpu_peak(reps: int):
    """Max over working-set sizes: too small starves the VPU pipeline on the
    serial dep chain, too large (3 carried arrays + input) spills vregs —
    e.g. (96, 512) i32 is 4x48 = 192 live vregs and measures VMEM traffic,
    not ALU peak (first run of this harness hit exactly that: 'peak' below
    the production kernel's achieved rate).  Sweep and take the best.

    Per-call work is held at a constant ~4e10 nominal ops regardless of
    shape, so device time (>=10 ms/call even at several Tops/s) dwarfs the
    axon tunnel's per-dispatch overhead — with a fixed small iteration count
    the 2nd run of this harness measured dispatch overhead, not the VPU."""
    OPS_TARGET = 4e10
    best = (0.0, None, None)
    for B in (8, 16, 32, 64):
        iters = 16 * max(1, round(OPS_TARGET / (10.0 * B * 512) / 16))
        x = jnp.ones((B, 512), jnp.int32)
        fn = jax.jit(
            lambda x, B=B, iters=iters: pl.pallas_call(
                functools.partial(_peak_kernel, iters=iters, unroll=16),
                out_shape=jax.ShapeDtypeStruct((B, 512), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )
        dt = timeit(fn, (x,), reps)
        ops = 10.0 * B * 512 * iters  # 9 ALU + 1 loop-mix margin -> 10 nominal
        print(f"  peak sweep B={B:3d}: {ops/dt/1e12:.2f} Tops/s "
              f"({dt*1e3:.1f} ms/call)", file=sys.stderr)
        if ops / dt > best[0]:
            best = (ops / dt, dt, B)
    print(f"  (peak sweep best at B={best[2]} x 512)", file=sys.stderr)
    return best[0], best[1]


# ------------------------------------------- 1b. shift-max chain microbench
def _chain_len(L: int) -> int:
    """Iterations of the suppression kernels' dilated doubling loop over a
    window of L (mirrors window_max/trailing_max/leading_min verbatim)."""
    n, k = 0, 1
    while k < L:
        step = min(k, L - k)
        n += 1
        k += step
    return n


def suppression_shiftmax_pairs(w: int, W: int, rounds: int = 2) -> int:
    """Shift+max pair count per element-launch of the fused bipolar round-1
    kernel (ops/pallas/suppress_kernel._round_kernel_bipolar_first):
    shared extrema chains (trailing_max over W + leading_min over W + the
    d-shift) plus, per round and per polarity, window_max(h) + leading_any
    + window_max(win_f)."""
    wm = 2 * _chain_len(w + 1)
    la = 1 + _chain_len(w)
    per_round_per_pol = 2 * wm + la
    extrema = 2 * _chain_len(W) + 1
    return extrema + rounds * 2 * per_round_per_pol


def _shiftmax_peak_kernel(x_ref, o_ref, *, rep: int, w: int):
    """Speed-of-light for the suppression op mix: dilated shift(concat)+max
    window chains on a (TBe, 128) f32 block, straight-line like the
    production kernels (a fori_loop carry round-trips the 224-vreg state
    through VMEM every iteration and halves the measured ceiling — the first
    run of this microbench landed BELOW the production kernel's achieved
    rate).  Chains alternate max-down / min-up so no composition is
    idempotent and nothing folds."""
    v = x_ref[:]
    TBe, R = v.shape

    def shift_down(y, s, fill):
        pad = jnp.full((s, R), fill, y.dtype)
        return jnp.concatenate([pad, y[: TBe - s]], axis=0)

    def shift_up(y, s, fill):
        pad = jnp.full((s, R), fill, y.dtype)
        return jnp.concatenate([y[s:], pad], axis=0)

    for _ in range(rep):
        y = v
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            y = jnp.maximum(y, shift_down(y, step, jnp.float32(-3.0e38)))
            k += step
        z = y
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            z = jnp.minimum(z, shift_up(z, step, jnp.float32(3.0e38)))
            k += step
        v = z
    o_ref[:] = v


def shiftmax_peak(w: int, TBe: int, reps: int):
    """Grid of straight-line chain blocks, every program on the same block
    (index_map -> 0) so HBM traffic mirrors production without uploading
    hundreds of MB through the tunnel."""
    REP = 32
    pairs_per_prog = 2 * _chain_len(w + 1) * REP
    NB = max(8, round(1e10 / (pairs_per_prog * TBe * 128)))
    x = jnp.ones((TBe, 128), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            functools.partial(_shiftmax_peak_kernel, rep=REP, w=w),
            grid=(NB,),
            in_specs=[pl.BlockSpec((TBe, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TBe, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TBe, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)
    )
    dt = timeit(fn, (x,), reps)
    pairs = float(pairs_per_prog) * NB * TBe * 128
    return pairs / dt, dt


# ----------------------------------------------- 3. k-step fused LIF variant
def _lif_kernel_bipolar_k(
    kp_ref, kn_ref, wp_ref, wn_ref, dash_syn_ref, dash_mem_ref, thr_ref,
    counts_ref, isyn_ref, vmem_ref, cnt_ref, inp_ref,
    *, TC: int, B: int, K: int,
):
    """k-step variant of ops/pallas/lif_kernel._lif_kernel_bipolar
    (flagship fast path only: rec_coef=0, no_sat, no tail): K steps per
    unrolled iteration, state loaded/stored once per K steps."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = jnp.zeros_like(isyn_ref)
        vmem_ref[:] = jnp.zeros_like(vmem_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    C = kp_ref.shape[2]
    kp2 = kp_ref[:].reshape(TC * B, C)
    kn2 = kn_ref[:].reshape(TC * B, C)
    pos = (kp2.astype(jnp.int32) * (1 - kn2.astype(jnp.int32))).astype(jnp.int8)
    inp_ref[:] = jnp.dot(pos, wp_ref[:], preferred_element_type=jnp.int32) + \
        jnp.dot(kn2, wn_ref[:], preferred_element_type=jnp.int32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def stepk(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk_sum = jnp.zeros_like(isyn)
        for j in range(K):
            cur = inp_ref[pl.ds((s * K + j) * B, B), :]
            isyn = isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur
            vmem = vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn
            fired = vmem >= threshold
            vmem = jnp.where(fired, vmem - threshold, vmem)
            spk_sum = spk_sum + fired.astype(jnp.int32)
        isyn_ref[:] = isyn
        vmem_ref[:] = vmem
        cnt_ref[:] = cnt_ref[:] + spk_sum
        return 0

    jax.lax.fori_loop(0, TC // K, stepk, 0, unroll=TC // K)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]


@functools.partial(jax.jit, static_argnames=("time_chunk", "k"))
def _lif_count_bipolar_k(kp_tbc, kn_tbc, w_in, dash_syn, dash_mem, threshold,
                         time_chunk: int, k: int):
    T, B, C = kp_tbc.shape
    N = w_in.shape[1]
    N_pad = _round_up(N, 128)
    TC = _fit_time_chunk(time_chunk, B, N_pad)
    assert T % TC == 0 and TC % k == 0

    kp_tbc = kp_tbc.astype(jnp.int8)
    kn_tbc = kn_tbc.astype(jnp.int8)
    wp = jnp.pad(w_in[:C].astype(jnp.int8), ((0, 0), (0, N_pad - N)))
    wn = jnp.pad(w_in[C:].astype(jnp.int8), ((0, 0), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=2**15 - 1).reshape(1, N_pad)

    spike_spec = pl.BlockSpec((TC, B, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    counts = pl.pallas_call(
        functools.partial(_lif_kernel_bipolar_k, TC=TC, B=B, K=k),
        grid=(T // TC,),
        in_specs=[spike_spec, spike_spec, w_spec, w_spec, vec_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((B, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((TC * B, N_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(kp_tbc, kn_tbc, wp, wn, dash_syn_p, dash_mem_p, thr_p)
    return counts[:, :N]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()
    B = args.batch

    from haghighatshoarmuir2024_tpu.utils.cache import prime_transfers

    t0 = time.time()
    prime_transfers()
    print(f"[primer {time.time() - t0:.1f}s]", file=sys.stderr)

    geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)
    demo = Demo(
        geometry=geometry, freq_bands=[[1600, 1900]],
        doa_list=np.linspace(-np.pi, np.pi, 449), recording_duration=0.25,
        kernel_duration=10e-3, bipolar_spikes=True, fs=FS,
    )
    cfg = demo.xylo_config
    T = 12000
    N = np.asarray(cfg.w_in).shape[1]
    N_pad = _round_up(N, 128)
    C = np.asarray(cfg.w_in).shape[0] // 2

    # representative spike masks: run the real encode once
    t = np.arange(0, 0.25, 1 / FS)
    sig = np.sin(2 * np.pi * 1750 * t)
    doas = np.linspace(-np.pi, np.pi, B, endpoint=False)
    frames = np.asarray(
        jax.jit(
            jax.vmap(lambda d: signal_from_template(geometry, t, sig, d, fs=FS))
        )(jnp.asarray(doas))
    ).astype(np.float32)
    frames += 0.1 * np.random.default_rng(0).standard_normal(frames.shape).astype(np.float32)

    from haghighatshoarmuir2024_tpu.models.xylo.pipeline import (
        _encode_cumsum, _stht_method,
    )

    kernel = np.asarray(demo.beamfs[0].kernel, np.float32)
    bas = demo._bas
    rw = demo.beamfs[0].robust_width

    stht_method = _stht_method()

    @jax.jit
    def encode_cs(sig_batch):
        return jax.vmap(
            lambda s: _encode_cumsum(
                s, kernel, bas=bas, stht_method=stht_method, time_major=True
            ),
            out_axes=1,
        )(sig_batch)  # (T, B, C)

    cs_dev = encode_cs(jnp.asarray(frames))
    cs_tm = jax.device_put(cs_dev.reshape(T, -1))

    @jax.jit
    def spikes_from_cs(cs):
        kp, kn = rzcc_encode_bipolar_tm(cs.reshape(T, B * C), rw, 2 * rw)
        return (kp.reshape(T, B, C).astype(jnp.int8),
                kn.reshape(T, B, C).astype(jnp.int8))

    kp, kn = spikes_from_cs(cs_dev)
    kp, kn = jax.device_put(kp), jax.device_put(kn)

    out = {}

    # 1. measured VPU peak (LIF op mix, register-resident)
    peak_ops, dt_peak = vpu_peak(reps=max(4, args.reps // 10))
    out["vpu_peak_measured_ops_per_s"] = peak_ops
    print(f"VPU peak (measured, LIF op mix): {peak_ops/1e12:.2f} Tops/s "
          f"({dt_peak*1e3:.3f} ms/call)", file=sys.stderr)

    # 2. production LIF kernel
    fn_lif = jax.jit(lambda a, b: lif_count_rates_bipolar(cfg, a, b, spike_bound=1))
    dt_lif = timeit(fn_lif, (kp, kn), args.reps)
    lif_ops = 11.0 * B * N_pad * T  # 2 shifts + 5 add/sub + cmp + select + 2 (cast+cnt)
    out["lif_ms"] = dt_lif * 1e3
    out["lif_achieved_ops_per_s"] = lif_ops / dt_lif
    out["lif_pct_of_peak"] = 100.0 * (lif_ops / dt_lif) / peak_ops
    print(f"LIF kernel: {dt_lif*1e3:.3f} ms -> {lif_ops/dt_lif/1e12:.2f} Tops/s "
          f"= {out['lif_pct_of_peak']:.0f}% of measured peak", file=sys.stderr)

    # 3. k-step variants
    wj = jnp.asarray(cfg.w_in, jnp.int32)
    dsj = jnp.asarray(cfg.dash_syn, jnp.int32)
    dmj = jnp.asarray(cfg.dash_mem, jnp.int32)
    thj = jnp.asarray(cfg.threshold, jnp.int32)
    base_counts = np.asarray(fn_lif(kp, kn))
    for k in (2, 4):
        fn_k = jax.jit(
            lambda a, b, k=k: _lif_count_bipolar_k(a, b, wj, dsj, dmj, thj,
                                                   time_chunk=32, k=k)
        )
        counts_k = np.asarray(fn_k(kp, kn))
        exact = bool(np.array_equal(counts_k, base_counts))
        dt_k = timeit(fn_k, (kp, kn), args.reps)
        out[f"lif_k{k}_ms"] = dt_k * 1e3
        out[f"lif_k{k}_exact"] = exact
        print(f"LIF k={k} fused: {dt_k*1e3:.3f} ms ({'exact' if exact else 'MISMATCH'}) "
              f"vs base {dt_lif*1e3:.3f} ms -> {dt_lif/dt_k:.2f}x", file=sys.stderr)

    # 4. suppression kernel (fused bipolar RZCC encode) vs its own op-mix
    # speed-of-light: the kernel's work is dilated shift(concat)+max chains,
    # not plain ALU ops, so the LIF-mix peak is the wrong ceiling.  Count
    # executed shift+max pairs with a Python twin of the kernel's chain
    # loops and compare against a VMEM-resident shift-max microbench.
    from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (
        _pick_tb, _round_up as _ru_sup, R_TILE,
    )

    fn_sup = jax.jit(lambda c: rzcc_encode_bipolar_tm(c, rw, 2 * rw))
    dt_sup = timeit(fn_sup, (cs_tm,), args.reps)
    tb, ROUNDS, MB1 = _pick_tb(rw, 2 * rw)
    TBe = tb + 2 * MB1
    Tp = _ru_sup(T, tb)
    Rp = _ru_sup(cs_tm.shape[1], R_TILE)
    elems = (Tp // tb) * (Rp // R_TILE) * TBe * R_TILE
    pairs_lo = suppression_shiftmax_pairs(rw, 2 * rw, rounds=1) * elems
    pairs_hi = suppression_shiftmax_pairs(rw, 2 * rw, rounds=ROUNDS) * elems

    sm_peak, _ = shiftmax_peak(rw, TBe, reps=max(4, args.reps // 10))
    out["suppress_ms"] = dt_sup * 1e3
    out["shiftmax_peak_pairs_per_s"] = sm_peak
    out["suppress_achieved_pairs_per_s_lo"] = pairs_lo / dt_sup
    out["suppress_achieved_pairs_per_s_hi"] = pairs_hi / dt_sup
    out["suppress_pct_of_shiftmax_peak_lo"] = 100.0 * (pairs_lo / dt_sup) / sm_peak
    out["suppress_pct_of_shiftmax_peak_hi"] = 100.0 * (pairs_hi / dt_sup) / sm_peak
    print(
        f"shift-max speed-of-light (w={rw}, TBe={TBe}): {sm_peak/1e9:.1f} Gpairs/s",
        file=sys.stderr)
    print(
        f"RZCC suppression: {dt_sup*1e3:.3f} ms -> "
        f"{pairs_lo/dt_sup/1e9:.1f}-{pairs_hi/dt_sup/1e9:.1f} Gpairs/s = "
        f"{out['suppress_pct_of_shiftmax_peak_lo']:.0f}-"
        f"{out['suppress_pct_of_shiftmax_peak_hi']:.0f}% of the shift-max "
        f"speed-of-light (lo = round-2 gating skips everywhere, hi = no "
        f"block skips; + mask/extrema logic outside the pair count)",
        file=sys.stderr)

    print(json.dumps({"experiment": "vpu_roofline", "batch": B, **{
        k: (round(v, 3) if isinstance(v, float) else v) for k, v in out.items()
    }}))
    np.asarray(jnp.zeros((), jnp.float32))  # exit drain


if __name__ == "__main__":
    main()
