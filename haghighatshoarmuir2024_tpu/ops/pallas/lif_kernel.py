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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lif_kernel(
    spikes_ref,  # (TC, B, C) int32 — time-major chunk
    w_ref,  # (C, N) float32
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
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = jnp.zeros_like(isyn_ref)
        vmem_ref[:] = jnp.zeros_like(vmem_ref)
        spk_ref[:] = jnp.zeros_like(spk_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # fused input projection for the whole chunk: (TC*B, C) @ (C, N)
    chunk = spikes_ref[:].reshape(TC * B, spikes_ref.shape[2]).astype(jnp.float32)
    # keep f32 in scratch (exact for our integer ranges); cast per-step slice
    inp_ref[:] = jnp.dot(chunk, w_ref[:], preferred_element_type=jnp.float32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :].astype(jnp.int32)
        if rec_coef != 0:
            rec = rec_coef * jnp.sum(spk, axis=1, keepdims=True)
            cur = cur + rec
        isyn = jnp.clip(
            isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur,
            _STATE_MIN,
            _STATE_MAX,
        )
        vmem = jnp.clip(
            vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn,
            _STATE_MIN,
            _STATE_MAX,
        )
        spk_new = (vmem >= threshold).astype(jnp.int32)
        vmem = vmem - spk_new * threshold
        valid = (t * TC + s) < T_actual
        spk_new = jnp.where(valid, spk_new, 0)
        isyn_ref[:] = jnp.where(valid, isyn, isyn_ref[:])
        vmem_ref[:] = jnp.where(valid, vmem, vmem_ref[:])
        spk_ref[:] = spk_new
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]


@functools.partial(jax.jit, static_argnames=("rec_coef", "time_chunk", "interpret"))
def _lif_count_impl(spikes_tbc, w_in, dash_syn, dash_mem, threshold, rec_coef, time_chunk,
                    interpret: bool = False):
    T, B, C = spikes_tbc.shape
    N = w_in.shape[1]
    TC = time_chunk
    T_pad = _round_up(T, TC)
    N_pad = _round_up(N, 128)
    C_pad = _round_up(C, 128)

    spikes_tbc = jnp.pad(spikes_tbc, ((0, T_pad - T), (0, 0), (0, C_pad - C)))
    w_p = jnp.pad(w_in.astype(jnp.float32), ((0, C_pad - C), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    # padded neurons get a huge threshold so they never fire
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel, TC=TC, B=B, T_actual=T, rec_coef=int(rec_coef)
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
            pltpu.VMEM((TC * B, N_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(spikes_tbc, w_p, dash_syn_p, dash_mem_p, thr_p)
    return counts[:, :N]


def lif_count_rates(config, spikes_in_batch, time_chunk: int = 32, time_major: bool = False):
    """Hidden-layer spike counts (B, N_hid) of the quantized LIF network.

    Exactly matches summing ``sim_hidden_batch(config, spikes)`` over time
    (same integer dynamics), without materializing the raster.  Requires a
    uniform (or zero) recurrence matrix; dense w_rec → use the scan simulator.

    ``time_major=True`` takes spikes already laid out (T, B, C) — the kernel's
    native layout — skipping a transpose on the hot path.
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
    return _lif_count_impl(
        spikes_tbc,
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
    )


# ----------------------------------------------------------- stateful variant
def _lif_kernel_stateful(
    spikes_ref, w_ref, dash_syn_ref, dash_mem_ref, thr_ref,
    isyn0_ref, vmem0_ref, spk0_ref,  # (B, N) int32 initial state
    counts_ref, isyn_out_ref, vmem_out_ref, spk_out_ref,
    isyn_ref, vmem_ref, spk_ref, cnt_ref, inp_ref,
    *, TC: int, B: int, T_actual: int, rec_coef: int,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        isyn_ref[:] = isyn0_ref[:]
        vmem_ref[:] = vmem0_ref[:]
        spk_ref[:] = spk0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    chunk = spikes_ref[:].reshape(TC * B, spikes_ref.shape[2]).astype(jnp.float32)
    inp_ref[:] = jnp.dot(chunk, w_ref[:], preferred_element_type=jnp.float32)

    dash_syn = dash_syn_ref[:]
    dash_mem = dash_mem_ref[:]
    threshold = thr_ref[:]

    def step(s, _):
        isyn = isyn_ref[:]
        vmem = vmem_ref[:]
        spk = spk_ref[:]
        cur = inp_ref[pl.ds(s * B, B), :].astype(jnp.int32)
        if rec_coef != 0:
            cur = cur + rec_coef * jnp.sum(spk, axis=1, keepdims=True)
        isyn = jnp.clip(
            isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur,
            _STATE_MIN, _STATE_MAX,
        )
        vmem = jnp.clip(
            vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn,
            _STATE_MIN, _STATE_MAX,
        )
        spk_new = (vmem >= threshold).astype(jnp.int32)
        vmem = vmem - spk_new * threshold
        valid = (t * TC + s) < T_actual
        spk_new = jnp.where(valid, spk_new, 0)
        isyn_ref[:] = jnp.where(valid, isyn, isyn_ref[:])
        vmem_ref[:] = jnp.where(valid, vmem, vmem_ref[:])
        spk_ref[:] = jnp.where(valid, spk_new, spk_ref[:])
        cnt_ref[:] = cnt_ref[:] + spk_new
        return 0

    jax.lax.fori_loop(0, TC, step, 0, unroll=TC)

    @pl.when(t == nt - 1)
    def _():
        counts_ref[:] = cnt_ref[:]
        isyn_out_ref[:] = isyn_ref[:]
        vmem_out_ref[:] = vmem_ref[:]
        spk_out_ref[:] = spk_ref[:]


@functools.partial(jax.jit, static_argnames=("rec_coef", "time_chunk", "interpret"))
def _lif_count_stateful_impl(
    spikes_tbc, w_in, dash_syn, dash_mem, threshold, isyn0, vmem0, spk0, rec_coef, time_chunk,
    interpret: bool = False,
):
    T, B, C = spikes_tbc.shape
    N = w_in.shape[1]
    TC = time_chunk
    T_pad = _round_up(T, TC)
    N_pad = _round_up(N, 128)
    C_pad = _round_up(C, 128)

    spikes_tbc = jnp.pad(spikes_tbc, ((0, T_pad - T), (0, 0), (0, C_pad - C)))
    w_p = jnp.pad(w_in.astype(jnp.float32), ((0, C_pad - C), (0, N_pad - N)))
    dash_syn_p = jnp.pad(dash_syn, (0, N_pad - N)).reshape(1, N_pad)
    dash_mem_p = jnp.pad(dash_mem, (0, N_pad - N)).reshape(1, N_pad)
    thr_p = jnp.pad(threshold, (0, N_pad - N), constant_values=_STATE_MAX).reshape(1, N_pad)
    pad_state = lambda s: jnp.pad(s.astype(jnp.int32), ((0, 0), (0, N_pad - N)))

    grid = (T_pad // TC,)
    kernel = functools.partial(
        _lif_kernel_stateful, TC=TC, B=B, T_actual=T, rec_coef=int(rec_coef)
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
            pltpu.VMEM((TC * B, N_pad), jnp.float32),
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


def lif_count_stateful(config, spikes_in_batch, isyn0, vmem0, spk0, time_chunk: int = 32):
    """Stateful batched LIF: (B, T, C) spikes + (B, N) initial state →
    (counts (B, N), final isyn/vmem/spk) — the streaming-runtime form of
    :func:`lif_count_rates` (state carries across chunk calls).

    Pallas on TPU; the lax.scan simulator elsewhere (identical integers).
    """
    wr = np.asarray(config.w_rec)
    if wr.size and not np.all(wr == wr.flat[0]):
        raise ValueError("lif_count_stateful requires uniform w_rec")
    rec_coef = int(wr.flat[0]) if wr.size else 0

    spikes = jnp.asarray(spikes_in_batch)
    if jax.default_backend() != "tpu":
        from ...models.xylo.sim import _sim_hidden

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

    spikes_tbc = jnp.transpose(spikes.astype(jnp.int8), (1, 0, 2))
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
    )
