"""Pallas kernel: batched integer-LIF spike-rate accumulation.

The quantized localization pipeline needs only the *mean hidden spike rate*
per neuron (micloc/xylo_snn_localization.py:379-398) — not the full (B, T, N)
hidden raster (1.4 GB at benchmark scale).  This kernel keeps everything
on-chip:

* grid over time chunks (``dimension_semantics=arbitrary`` → sequential on one
  core, so VMEM scratch carries the neuron state across chunks);
* per chunk, the input projection ``spikes @ w_in`` runs on the MXU straight
  out of VMEM (float32 accumulation is integer-exact for int8 weights × small
  spike counts);
* the per-step state update (bitshift decay, saturation, threshold/subtract
  reset — identical semantics to ``sim._sim_hidden``) is an unrolled VPU loop
  over the chunk with ``(B, N)`` int32 state resident in VMEM;
* only the per-neuron spike *counts* (B, N) ever leave the chip.

Uniform recurrence (the DC-cancelling ``c·ones`` of the reference,
micloc/xylo_snn_localization.py:230-232) is supported as a scalar feedback
``c·Σ_n spk``; a general dense w_rec falls back to the lax.scan simulator.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STATE_MIN = -(2**15)
_STATE_MAX = 2**15 - 1


def _fit_time_chunk(tc: int, B: int, N_pad: int, n_state: int = 4) -> int:
    """Largest power-of-two time chunk <= ``tc`` whose scratch footprint —
    the (TC*B, N_pad) int32 projected-input buffer plus ``n_state`` (B,
    N_pad) int32 state planes — fits the 16 MB scoped-VMEM cap with headroom
    for in/out blocks, weights and compiler temporaries.  Wide networks
    (e.g. 3 bands x 449 grid = N_pad 1408) OOM at the default TC=32;
    halving TC trades a little grid overhead for fitting."""
    budget = 13 * 2**20 - n_state * B * N_pad * 4
    while tc > 4 and tc * B * N_pad * 4 > budget:
        tc //= 2
    return max(tc, 4)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _no_saturation_possible(config, spike_bound: int, rec_coef: int) -> bool:
    """Static proof that the 16-bit state clips can never bind.

    With per-step input current bounded by ``cur_max`` the decayed integrator
    satisfies the inductive invariant ``|isyn| <= (cur_max + 1) << ds`` (the
    +1 absorbs the floor-rounding of the arithmetic shift), and likewise
    ``|vmem| <= (B_isyn + 1) << dm`` (threshold subtraction only moves vmem
    toward 0).  When both bounds fit in int16 the clips are dead ops and the
    kernel may skip them — saving ~4 VPU ops per simulated step with
    *provably identical* integer results.
    """
    w = np.abs(np.asarray(config.w_in)).sum(axis=0)
    if w.size == 0:
        return False
    n_hid = np.asarray(config.w_in).shape[1]
    cur_max = int(spike_bound) * int(w.max()) + abs(int(rec_coef)) * n_hid
    ds = int(np.max(config.dash_syn))
    dm = int(np.max(config.dash_mem))
    b_isyn = (cur_max + 1) << ds
    b_vmem = (b_isyn + 1) << dm
    return b_isyn <= _STATE_MAX and b_vmem <= _STATE_MAX


def _lif_kernel(
    spikes_ref,  # (TC, B, C) int8 — time-major chunk
    w_ref,  # (C, N) int8 (MXU int8 path) or float32
    dash_syn_ref,  # (1, N) int32
    dash_mem_ref,  # (1, N) int32
    thr_ref,  # (1, N) int32
    counts_ref,  # (B, N) int32 output
    isyn_ref,  # scratch (B, N) int32
    vmem_ref,  # scratch (B, N) int32
    spk_ref,  # scratch (B, N) int32
    cnt_ref,  # scratch (B, N) int32
    inp_ref,  # scratch (TC*B, N) int32 — per-chunk projected input
    *,
    TC: int,
    B: int,
    T_actual: int,
    rec_coef: int,
    has_tail: bool,
    no_sat: bool,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = jnp.zeros_like(isyn_ref)
        vmem_ref[:] = jnp.zeros_like(vmem_ref)
        spk_ref[:] = jnp.zeros_like(spk_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # fused input projection for the whole chunk: (TC*B, C) @ (C, N).
    # int8 × int8 → int32 runs natively on the MXU (v5e) — exact, and ~4x the
    # f32 rate; the f32 variant (exact for our ranges) is the fallback.
    chunk = spikes_ref[:].reshape(TC * B, spikes_ref.shape[2])
    if w_ref.dtype == jnp.int8:
        inp_ref[:] = jnp.dot(chunk, w_ref[:], preferred_element_type=jnp.int32)
    else:
        inp_ref[:] = jnp.dot(
            chunk.astype(jnp.float32), w_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :]
        if rec_coef != 0:
            rec = rec_coef * jnp.sum(spk, axis=1, keepdims=True)
            cur = cur + rec
        isyn = isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur
        if not no_sat:
            isyn = jnp.clip(isyn, _STATE_MIN, _STATE_MAX)
        vmem = vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn
        if not no_sat:
            vmem = jnp.clip(vmem, _STATE_MIN, _STATE_MAX)
        # select-form threshold reset (measured perf-neutral vs
        # spk*threshold mul+sub; kept for the clearer data flow)
        fired = vmem >= threshold
        vmem = jnp.where(fired, vmem - threshold, vmem)
        spk_new = fired.astype(jnp.int32)
        if has_tail:
            # counts are only accumulated for real steps; state past T_actual
            # may keep evolving (it is discarded — this kernel returns counts
            # only, and time flows forward, so post-T state never feeds back
            # into counted steps)
            valid = ((t * TC + s) < T_actual).astype(jnp.int32)
            spk_new = spk_new * valid
        isyn_ref[:] = isyn
        vmem_ref[:] = vmem
        if rec_coef != 0:
            spk_ref[:] = spk_new
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("rec_coef", "time_chunk", "interpret", "int8_mm", "no_sat"),
)
def _lif_count_impl(spikes_tbc, w_in, dash_syn, dash_mem, threshold, rec_coef, time_chunk,
                    interpret: bool = False, int8_mm: bool = True, no_sat: bool = False):
    T, B, C = spikes_tbc.shape
    N = w_in.shape[1]
    N_pad = _round_up(N, 128)
    TC = _fit_time_chunk(time_chunk, B, N_pad)
    T_pad = _round_up(T, TC)
    C_pad = _round_up(C, 128)

    spikes_tbc = jnp.pad(spikes_tbc, ((0, T_pad - T), (0, 0), (0, C_pad - C)))
    if int8_mm:
        # int8 MXU path: requires |w| <= 127 and spike counts <= 127 (Xylo
        # spikes are 4-bit counts; the wrapper guards the weights)
        spikes_tbc = spikes_tbc.astype(jnp.int8)
    w_dtype = jnp.int8 if int8_mm else jnp.float32
    w_p = jnp.pad(w_in.astype(w_dtype), ((0, C_pad - C), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    # padded neurons get a huge threshold so they never fire
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel, TC=TC, B=B, T_actual=T, rec_coef=int(rec_coef),
        has_tail=(T_pad != T), no_sat=no_sat,
    )
    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TC, B, C_pad), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C_pad, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((TC * B, N_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(spikes_tbc, w_p, dash_syn_p, dash_mem_p, thr_p)
    return counts[:, :N]


def lif_count_rates(config, spikes_in_batch, time_chunk: int = 32, time_major: bool = False,
                    spike_bound: int | None = None):
    """Hidden-layer spike counts (B, N_hid) of the quantized LIF network.

    Exactly matches summing ``sim_hidden_batch(config, spikes)`` over time
    (same integer dynamics), without materializing the raster.  Requires a
    uniform (or zero) recurrence matrix; dense w_rec → use the scan simulator.

    ``time_major=True`` takes spikes already laid out (T, B, C) — the kernel's
    native layout — skipping a transpose on the hot path.

    ``spike_bound``: optional caller-guaranteed bound on per-step input spike
    values (1 for RZCC masks).  When given, a static bound analysis may prove
    the 16-bit saturation clips dead and elide them — identical integers,
    fewer VPU ops.
    """
    wr = np.asarray(config.w_rec)
    if wr.size and not np.all(wr == wr.flat[0]):
        raise ValueError("lif_count_rates requires uniform w_rec; use sim_hidden_batch")
    rec_coef = int(wr.flat[0]) if wr.size else 0

    if jax.default_backend() != "tpu":
        # backend fallback (the reference's XyloSamna→XyloSim pattern,
        # micloc/xylo_snn_localization.py:292-313): identical integer dynamics
        # through the lax.scan simulator on CPU/GPU
        from ...models.xylo.sim import sim_hidden_batch

        spikes = jnp.asarray(spikes_in_batch, jnp.int32)
        if time_major:
            spikes = jnp.transpose(spikes, (1, 0, 2))
        return sim_hidden_batch(config, spikes).sum(axis=1)

    spikes = jnp.asarray(spikes_in_batch, jnp.int8)
    spikes_tbc = spikes if time_major else jnp.transpose(spikes, (1, 0, 2))  # (T, B, C)
    # int8 MXU path requires int8-exact weights (Xylo quantization guarantees
    # |w| <= 127, but guard anyway); spike values are int8 by the cast above
    w_np = np.asarray(config.w_in)
    int8_mm = bool(np.all(np.abs(w_np) <= 127))
    no_sat = (
        _no_saturation_possible(config, spike_bound, rec_coef)
        if spike_bound is not None
        else False
    )
    return _lif_count_impl(
        spikes_tbc,
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
        int8_mm=int8_mm,
        no_sat=no_sat,
    )


# ----------------------------------------------------------- bipolar variant
def _lif_kernel_bipolar(
    kp_ref, kn_ref,  # (TC, B, C) int8 — kept masks per polarity (suppression out)
    wp_ref, wn_ref,  # (C, N) int8 or float32 — w_in split by polarity rows
    dash_syn_ref, dash_mem_ref, thr_ref,
    counts_ref,
    isyn_ref, vmem_ref, spk_ref, cnt_ref, inp_ref,
    *, TC: int, B: int, T_actual: int, rec_coef: int, has_tail: bool, no_sat: bool,
):
    """Count kernel fused with the bipolar RZCC polarity combination: takes the
    two raw suppression masks and computes ``pos = kp & ~kn`` (the reference's
    −1-wins-on-collision overwrite, micloc/xylo_snn_localization.py:344-355)
    in-register — the XLA concat/relayout building a (T, B, 2C) raster
    disappears, and the projection runs as two narrow int8 MXU dots.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = jnp.zeros_like(isyn_ref)
        vmem_ref[:] = jnp.zeros_like(vmem_ref)
        spk_ref[:] = jnp.zeros_like(spk_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    C = kp_ref.shape[2]
    kp2 = kp_ref[:].reshape(TC * B, C)
    kn2 = kn_ref[:].reshape(TC * B, C)
    if wp_ref.dtype == jnp.int8:
        # int8 elementwise multiply miscompiles in Mosaic — upcast for the
        # mask combination, cast back for the int8 MXU dot
        pos = (kp2.astype(jnp.int32) * (1 - kn2.astype(jnp.int32))).astype(jnp.int8)
        inp_ref[:] = jnp.dot(pos, wp_ref[:], preferred_element_type=jnp.int32) + \
            jnp.dot(kn2, wn_ref[:], preferred_element_type=jnp.int32)
    else:
        kpf = kp2.astype(jnp.float32)
        knf = kn2.astype(jnp.float32)
        pos = kpf * (1.0 - knf)
        inp_ref[:] = (
            jnp.dot(pos, wp_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(knf, wn_ref[:], preferred_element_type=jnp.float32)
        ).astype(jnp.int32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :]
        if rec_coef != 0:
            cur = cur + rec_coef * jnp.sum(spk, axis=1, keepdims=True)
        isyn = isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur
        if not no_sat:
            isyn = jnp.clip(isyn, _STATE_MIN, _STATE_MAX)
        vmem = vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn
        if not no_sat:
            vmem = jnp.clip(vmem, _STATE_MIN, _STATE_MAX)
        # select-form threshold reset (measured perf-neutral vs
        # spk*threshold mul+sub; kept for the clearer data flow)
        fired = vmem >= threshold
        vmem = jnp.where(fired, vmem - threshold, vmem)
        spk_new = fired.astype(jnp.int32)
        if has_tail:
            valid = ((t * TC + s) < T_actual).astype(jnp.int32)
            spk_new = spk_new * valid
        isyn_ref[:] = isyn
        vmem_ref[:] = vmem
        if rec_coef != 0:
            spk_ref[:] = spk_new
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("rec_coef", "time_chunk", "interpret", "int8_mm", "no_sat"),
)
def _lif_count_bipolar_impl(kp_tbc, kn_tbc, w_in, dash_syn, dash_mem, threshold,
                            rec_coef, time_chunk, interpret: bool = False,
                            int8_mm: bool = True, no_sat: bool = False):
    T, B, C = kp_tbc.shape
    N = w_in.shape[1]
    N_pad = _round_up(N, 128)
    TC = _fit_time_chunk(time_chunk, B, N_pad)
    T_pad = _round_up(T, TC)

    dt = jnp.int8 if int8_mm else jnp.float32
    kp_tbc = jnp.pad(kp_tbc.astype(jnp.int8), ((0, T_pad - T), (0, 0), (0, 0)))
    kn_tbc = jnp.pad(kn_tbc.astype(jnp.int8), ((0, T_pad - T), (0, 0), (0, 0)))
    wp = jnp.pad(w_in[:C].astype(dt), ((0, 0), (0, N_pad - N)))
    wn = jnp.pad(w_in[C:].astype(dt), ((0, 0), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel_bipolar, TC=TC, B=B, T_actual=T, rec_coef=int(rec_coef),
        has_tail=(T_pad != T), no_sat=no_sat,
    )
    spike_spec = pl.BlockSpec((TC, B, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spike_spec, spike_spec, w_spec, w_spec, vec_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((B, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((TC * B, N_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(kp_tbc, kn_tbc, wp, wn, dash_syn_p, dash_mem_p, thr_p)
    return counts[:, :N]


def lif_count_rates_bipolar(config, kp_tbc, kn_tbc, time_chunk: int = 32,
                            spike_bound: int | None = 1):
    """Hidden-layer spike counts straight from the two time-major (T, B, C)
    RZCC polarity masks: ``pos = kp & ~kn`` (reference overwrite semantics)
    and the 2C-channel projection happen inside the kernel — equivalent to
    ``lif_count_rates(config, concat([kp & ~kn, kn], -1), time_major=True)``
    without materializing the combined raster.

    ``config.w_in`` must have 2C rows ([:C] positive, [C:] negative).
    """
    wr = np.asarray(config.w_rec)
    if wr.size and not np.all(wr == wr.flat[0]):
        raise ValueError("lif_count_rates_bipolar requires uniform w_rec")
    rec_coef = int(wr.flat[0]) if wr.size else 0

    kp_tbc = jnp.asarray(kp_tbc)
    kn_tbc = jnp.asarray(kn_tbc)
    if jax.default_backend() != "tpu":
        pos = (kp_tbc & ~(kn_tbc != 0)).astype(jnp.int8) if kp_tbc.dtype == jnp.bool_ \
            else ((kp_tbc != 0) & ~(kn_tbc != 0)).astype(jnp.int8)
        neg = (kn_tbc != 0).astype(jnp.int8)
        enc = jnp.concatenate([pos, neg], axis=-1)
        return lif_count_rates(
            config, enc, time_chunk=time_chunk, time_major=True,
            spike_bound=spike_bound,
        )

    w_np = np.asarray(config.w_in)
    int8_mm = bool(np.all(np.abs(w_np) <= 127))
    no_sat = (
        _no_saturation_possible(config, spike_bound, rec_coef)
        if spike_bound is not None
        else False
    )
    # Mosaic landmine: the in-kernel (TC, B, C) -> (TC*B, C) int8 shape cast
    # only lowers when B is a multiple of 4 (the int8 4-per-word sublane
    # packing) or B == 1 — measured: 1/4/24/96 compile, 2/3/6/17/18 hit an
    # 'unsupported shape cast' HTTP 500.  Pad the batch with zero-spike rows
    # (inert dynamics) and slice the counts back.
    B = kp_tbc.shape[1]
    B_pad = 0 if (B == 1 or B % 4 == 0) else (-B) % 4
    if B_pad:
        pad = ((0, 0), (0, B_pad), (0, 0))
        kp_tbc = jnp.pad(kp_tbc.astype(jnp.int8), pad)
        kn_tbc = jnp.pad(kn_tbc.astype(jnp.int8), pad)
    counts = _lif_count_bipolar_impl(
        kp_tbc.astype(jnp.int8),
        kn_tbc.astype(jnp.int8),
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
        int8_mm=int8_mm,
        no_sat=no_sat,
    )
    return counts[:B] if B_pad else counts


# ----------------------------------------------- stateful bipolar variant
def _lif_kernel_bipolar_stateful(
    kp_ref, kn_ref, wp_ref, wn_ref,
    dash_syn_ref, dash_mem_ref, thr_ref,
    isyn0_ref, vmem0_ref, spk0_ref,
    counts_ref, isyn_out_ref, vmem_out_ref, spk_out_ref,
    isyn_ref, vmem_ref, spk_ref, cnt_ref, inp_ref,
    *, TC: int, B: int, T_actual: int, rec_coef: int, has_tail: bool, no_sat: bool,
):
    """Streaming form of :func:`_lif_kernel_bipolar`: initial state in, final
    state out — the serving runtime's per-chunk LIF with the polarity
    combination and int8 MXU projection fused in."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = isyn0_ref[:]
        vmem_ref[:] = vmem0_ref[:]
        spk_ref[:] = spk0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    C = kp_ref.shape[2]
    kp2 = kp_ref[:].reshape(TC * B, C)
    kn2 = kn_ref[:].reshape(TC * B, C)
    if wp_ref.dtype == jnp.int8:
        pos = (kp2.astype(jnp.int32) * (1 - kn2.astype(jnp.int32))).astype(jnp.int8)
        inp_ref[:] = jnp.dot(pos, wp_ref[:], preferred_element_type=jnp.int32) + \
            jnp.dot(kn2, wn_ref[:], preferred_element_type=jnp.int32)
    else:
        kpf = kp2.astype(jnp.float32)
        knf = kn2.astype(jnp.float32)
        pos = kpf * (1.0 - knf)
        inp_ref[:] = (
            jnp.dot(pos, wp_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(knf, wn_ref[:], preferred_element_type=jnp.float32)
        ).astype(jnp.int32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :]
        if rec_coef != 0:
            cur = cur + rec_coef * jnp.sum(spk, axis=1, keepdims=True)
        isyn = isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur
        if not no_sat:
            isyn = jnp.clip(isyn, _STATE_MIN, _STATE_MAX)
        vmem = vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn
        if not no_sat:
            vmem = jnp.clip(vmem, _STATE_MIN, _STATE_MAX)
        # select-form threshold reset (measured perf-neutral vs
        # spk*threshold mul+sub; kept for the clearer data flow)
        fired = vmem >= threshold
        vmem = jnp.where(fired, vmem - threshold, vmem)
        spk_new = fired.astype(jnp.int32)
        if has_tail:
            valid = (t * TC + s) < T_actual
            spk_new = jnp.where(valid, spk_new, 0)
            isyn_ref[:] = jnp.where(valid, isyn, isyn_ref[:])
            vmem_ref[:] = jnp.where(valid, vmem, vmem_ref[:])
            spk_ref[:] = jnp.where(valid, spk_new, spk_ref[:])
        else:
            isyn_ref[:] = isyn
            vmem_ref[:] = vmem
            spk_ref[:] = spk_new
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]
        isyn_out_ref[:] = isyn_ref[:]
        vmem_out_ref[:] = vmem_ref[:]
        spk_out_ref[:] = spk_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("rec_coef", "time_chunk", "interpret", "int8_mm", "no_sat"),
)
def _lif_count_bipolar_stateful_impl(
    kp_tbc, kn_tbc, w_in, dash_syn, dash_mem, threshold, isyn0, vmem0, spk0,
    rec_coef, time_chunk, interpret: bool = False, int8_mm: bool = True,
    no_sat: bool = False,
):
    T, B, C = kp_tbc.shape
    N = w_in.shape[1]
    N_pad = _round_up(N, 128)
    TC = _fit_time_chunk(time_chunk, B, N_pad)
    T_pad = _round_up(T, TC)

    dt = jnp.int8 if int8_mm else jnp.float32
    kp_tbc = jnp.pad(kp_tbc.astype(jnp.int8), ((0, T_pad - T), (0, 0), (0, 0)))
    kn_tbc = jnp.pad(kn_tbc.astype(jnp.int8), ((0, T_pad - T), (0, 0), (0, 0)))
    wp = jnp.pad(w_in[:C].astype(dt), ((0, 0), (0, N_pad - N)))
    wn = jnp.pad(w_in[C:].astype(dt), ((0, 0), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)
    pad_state = lambda s: jnp.pad(s.astype(jnp.int32), ((0, 0), (0, N_pad - N)))

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel_bipolar_stateful, TC=TC, B=B, T_actual=T,
        rec_coef=int(rec_coef), has_tail=(T_pad != T), no_sat=no_sat,
    )
    spike_spec = pl.BlockSpec((TC, B, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((B, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    counts, isyn_f, vmem_f, spk_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spike_spec, spike_spec, w_spec, w_spec, vec_spec, vec_spec,
                  vec_spec, state_spec, state_spec, state_spec],
        out_specs=(state_spec, state_spec, state_spec, state_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, N_pad), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((TC * B, N_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(kp_tbc, kn_tbc, wp, wn, dash_syn_p, dash_mem_p, thr_p,
      pad_state(isyn0), pad_state(vmem0), pad_state(spk0))
    return counts[:, :N], isyn_f[:, :N], vmem_f[:, :N], spk_f[:, :N]


def lif_count_stateful_bipolar(config, kp_tbc, kn_tbc, isyn0, vmem0, spk0,
                               time_chunk: int = 32, spike_bound: int | None = 1):
    """Stateful bipolar LIF: time-major (T, B, C) polarity masks + (B, N)
    initial state → (counts, final isyn/vmem/spk) — the serving runtime's
    form of :func:`lif_count_rates_bipolar` (state carries across chunks)."""
    wr = np.asarray(config.w_rec)
    if wr.size and not np.all(wr == wr.flat[0]):
        raise ValueError("lif_count_stateful_bipolar requires uniform w_rec")
    rec_coef = int(wr.flat[0]) if wr.size else 0

    kp_tbc = jnp.asarray(kp_tbc)
    kn_tbc = jnp.asarray(kn_tbc)
    if jax.default_backend() != "tpu":
        pos = ((kp_tbc != 0) & ~(kn_tbc != 0)).astype(jnp.int8)
        neg = (kn_tbc != 0).astype(jnp.int8)
        enc = jnp.concatenate([pos, neg], axis=-1)
        return lif_count_stateful(
            config, enc, isyn0, vmem0, spk0, time_chunk=time_chunk,
            spike_bound=spike_bound, time_major=True,
        )

    w_np = np.asarray(config.w_in)
    int8_mm = bool(np.all(np.abs(w_np) <= 127))
    no_sat = (
        _no_saturation_possible(config, spike_bound, rec_coef)
        if spike_bound is not None
        else False
    )
    # batch padded to a multiple of 4: the in-kernel int8 shape cast only
    # lowers for B % 4 == 0 or B == 1 (see lif_count_rates_bipolar)
    B = kp_tbc.shape[1]
    B_pad = 0 if (B == 1 or B % 4 == 0) else (-B) % 4
    if B_pad:
        pad3 = ((0, 0), (0, B_pad), (0, 0))
        pad2 = ((0, B_pad), (0, 0))
        kp_tbc = jnp.pad(kp_tbc.astype(jnp.int8), pad3)
        kn_tbc = jnp.pad(kn_tbc.astype(jnp.int8), pad3)
        isyn0 = jnp.pad(jnp.asarray(isyn0, jnp.int32), pad2)
        vmem0 = jnp.pad(jnp.asarray(vmem0, jnp.int32), pad2)
        spk0 = jnp.pad(jnp.asarray(spk0, jnp.int32), pad2)
    out = _lif_count_bipolar_stateful_impl(
        kp_tbc.astype(jnp.int8),
        kn_tbc.astype(jnp.int8),
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        jnp.asarray(isyn0, jnp.int32),
        jnp.asarray(vmem0, jnp.int32),
        jnp.asarray(spk0, jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
        int8_mm=int8_mm,
        no_sat=no_sat,
    )
    if B_pad:
        out = tuple(o[:B] for o in out)
    return out


# ----------------------------------------------------------- stateful variant
def _lif_kernel_stateful(
    spikes_ref, w_ref, dash_syn_ref, dash_mem_ref, thr_ref,
    isyn0_ref, vmem0_ref, spk0_ref,  # (B, N) int32 initial state
    counts_ref, isyn_out_ref, vmem_out_ref, spk_out_ref,
    isyn_ref, vmem_ref, spk_ref, cnt_ref, inp_ref,
    *, TC: int, B: int, T_actual: int, rec_coef: int, has_tail: bool,
    no_sat: bool,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = isyn0_ref[:]
        vmem_ref[:] = vmem0_ref[:]
        spk_ref[:] = spk0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    chunk = spikes_ref[:].reshape(TC * B, spikes_ref.shape[2])
    if w_ref.dtype == jnp.int8:
        inp_ref[:] = jnp.dot(chunk, w_ref[:], preferred_element_type=jnp.int32)
    else:
        inp_ref[:] = jnp.dot(
            chunk.astype(jnp.float32), w_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :]
        if rec_coef != 0:
            cur = cur + rec_coef * jnp.sum(spk, axis=1, keepdims=True)
        isyn = isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur
        if not no_sat:
            isyn = jnp.clip(isyn, _STATE_MIN, _STATE_MAX)
        vmem = vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn
        if not no_sat:
            vmem = jnp.clip(vmem, _STATE_MIN, _STATE_MAX)
        # select-form threshold reset (measured perf-neutral vs
        # spk*threshold mul+sub; kept for the clearer data flow)
        fired = vmem >= threshold
        vmem = jnp.where(fired, vmem - threshold, vmem)
        spk_new = fired.astype(jnp.int32)
        if has_tail:
            # the final state is part of this kernel's contract, so past
            # T_actual both the counted spikes AND the state writes freeze
            valid = (t * TC + s) < T_actual
            spk_new = jnp.where(valid, spk_new, 0)
            isyn_ref[:] = jnp.where(valid, isyn, isyn_ref[:])
            vmem_ref[:] = jnp.where(valid, vmem, vmem_ref[:])
            spk_ref[:] = jnp.where(valid, spk_new, spk_ref[:])
        else:
            isyn_ref[:] = isyn
            vmem_ref[:] = vmem
            spk_ref[:] = spk_new
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]
        isyn_out_ref[:] = isyn_ref[:]
        vmem_out_ref[:] = vmem_ref[:]
        spk_out_ref[:] = spk_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("rec_coef", "time_chunk", "interpret", "int8_mm", "no_sat"),
)
def _lif_count_stateful_impl(
    spikes_tbc, w_in, dash_syn, dash_mem, threshold, isyn0, vmem0, spk0, rec_coef, time_chunk,
    interpret: bool = False, int8_mm: bool = True, no_sat: bool = False,
):
    T, B, C = spikes_tbc.shape
    N = w_in.shape[1]
    N_pad = _round_up(N, 128)
    TC = _fit_time_chunk(time_chunk, B, N_pad)
    T_pad = _round_up(T, TC)
    C_pad = _round_up(C, 128)

    spikes_tbc = jnp.pad(spikes_tbc, ((0, T_pad - T), (0, 0), (0, C_pad - C)))
    if int8_mm:
        spikes_tbc = spikes_tbc.astype(jnp.int8)
    w_dtype = jnp.int8 if int8_mm else jnp.float32
    w_p = jnp.pad(w_in.astype(w_dtype), ((0, C_pad - C), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)
    pad_state = lambda s: jnp.pad(s.astype(jnp.int32), ((0, 0), (0, N_pad - N)))

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel_stateful, TC=TC, B=B, T_actual=T, rec_coef=int(rec_coef),
        has_tail=(T_pad != T), no_sat=no_sat,
    )
    state_spec = pl.BlockSpec((B, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM)
    counts, isyn_f, vmem_f, spk_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TC, B, C_pad), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C_pad, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec,
        ],
        out_specs=(state_spec, state_spec, state_spec, state_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, N_pad), jnp.int32) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((B, N_pad), jnp.int32),
            pltpu.VMEM((TC * B, N_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(spikes_tbc, w_p, dash_syn_p, dash_mem_p, thr_p,
      pad_state(isyn0), pad_state(vmem0), pad_state(spk0))
    return (
        counts[:, :N],
        isyn_f[:, :N],
        vmem_f[:, :N],
        spk_f[:, :N],
    )


def lif_count_stateful(config, spikes_in_batch, isyn0, vmem0, spk0, time_chunk: int = 32,
                       spike_bound: int | None = None, time_major: bool = False):
    """Stateful batched LIF: (B, T, C) spikes + (B, N) initial state →
    (counts (B, N), final isyn/vmem/spk) — the streaming-runtime form of
    :func:`lif_count_rates` (state carries across chunk calls).

    Pallas on TPU; the lax.scan simulator elsewhere (identical integers).

    ``spike_bound`` (see :func:`lif_count_rates`): the caller additionally
    guarantees the initial state was produced by the same bounded dynamics
    (e.g. zeros + prior chunks of the same stream), so the no-saturation
    invariant carries across chunk boundaries.
    """
    wr = np.asarray(config.w_rec)
    if wr.size and not np.all(wr == wr.flat[0]):
        raise ValueError("lif_count_stateful requires uniform w_rec")
    rec_coef = int(wr.flat[0]) if wr.size else 0

    spikes = jnp.asarray(spikes_in_batch)
    if jax.default_backend() != "tpu":
        from ...models.xylo.sim import _sim_hidden

        if time_major:
            spikes = jnp.transpose(spikes, (1, 0, 2))
        w_rec = jnp.asarray(config.w_rec, jnp.int32)
        rc = jnp.asarray(rec_coef, jnp.int32)
        ds = jnp.asarray(config.dash_syn, jnp.int32)
        dm = jnp.asarray(config.dash_mem, jnp.int32)
        th = jnp.asarray(config.threshold, jnp.int32)
        w_in = jnp.asarray(config.w_in, jnp.int32)

        def one(spk_bt, i0, v0, s0):
            inp = jnp.dot(
                spk_bt.astype(jnp.float32), w_in.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            spikes_out, carry, _ = _sim_hidden(
                inp, w_rec, rc, ds, dm, th, (i0, v0, s0),
                uniform_rec=True, record=False,
            )
            return spikes_out.sum(axis=0), carry[0], carry[1], carry[2]

        counts, i_f, v_f, s_f = jax.vmap(one)(
            spikes.astype(jnp.int32),
            jnp.asarray(isyn0, jnp.int32),
            jnp.asarray(vmem0, jnp.int32),
            jnp.asarray(spk0, jnp.int32),
        )
        return counts, i_f, v_f, s_f

    spikes = spikes.astype(jnp.int8)
    spikes_tbc = spikes if time_major else jnp.transpose(spikes, (1, 0, 2))
    w_np = np.asarray(config.w_in)
    int8_mm = bool(np.all(np.abs(w_np) <= 127))
    no_sat = (
        _no_saturation_possible(config, spike_bound, rec_coef)
        if spike_bound is not None
        else False
    )
    return _lif_count_stateful_impl(
        spikes_tbc,
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        jnp.asarray(isyn0, jnp.int32),
        jnp.asarray(vmem0, jnp.int32),
        jnp.asarray(spk0, jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
        int8_mm=int8_mm,
        no_sat=no_sat,
    )
