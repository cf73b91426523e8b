"""Streaming localization runtime — carried-state chunked processing.

The reference processes audio in independent 0.25 s recordings with full
transient re-settling per frame and Python/rockpool hops between stages
(micloc/xylo_snn_localization.py:446-542).  Here the full
encode→SNN→rate chain runs as ONE jitted step per chunk with all filter /
encoder / neuron state carried on device, so multi-second (or infinite) audio
streams through without host round-trips and without re-paying transients:

* STHT: the quadrature FIR carries its K−1 tap history; the in-phase branch is
  a true K/2-sample delay line (the reference's ``np.roll`` wrap-around is a
  whole-signal operation — its first K/2 wrapped samples are start-of-stream
  transient only, identical thereafter).
* Bandpass+integration IIR: transposed DF2 state carried exactly
  (cumsum is folded into the denominator as in the offline pipeline).
* RZCC: peak decisions need lookahead (local-max + distance suppression), so
  the last ``pending`` samples of each chunk stay undecided until the next
  chunk arrives; a ``guard`` window of already-decided samples precedes the
  analysis buffer so suppression works across the seam.  For the RZCC signal
  class (bandpassed oscillation, genuine peaks ≥ 2·robust_width apart)
  decisions match the offline encoder exactly; pathological suppression
  chains longer than the pending window are the only divergence.
* Integer LIF: isyn/vmem/spike state carried exactly (bit-identical to the
  offline simulator fed the same spikes).

Emitted spike counts lag the input by ``pending`` samples — the price of
streaming causality.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class StreamState(NamedTuple):
    fir_tail: jnp.ndarray  # (K-1, M) raw-signal history for the quadrature FIR
    delay_line: jnp.ndarray  # (K//2, M) in-phase delay
    iir_state: jnp.ndarray  # (C, N_state) filter state (folded form on CPU;
    #                         bandpass-only TDF2 state on TPU)
    int_carry: jnp.ndarray  # (C,) integrator carry (TPU path; zeros on CPU)
    pending: jnp.ndarray  # (guard + P, C) undecided integrated samples
    isyn: jnp.ndarray  # (N,) int32
    vmem: jnp.ndarray  # (N,) int32
    spk: jnp.ndarray  # (N,) int32
    counts: jnp.ndarray  # (N,) int32 accumulated hidden spikes
    steps: jnp.ndarray  # () int32 decided timesteps so far


class StreamingLocalizer:
    """Streaming twin of the quantized pipeline (models.xylo.Demo)."""

    def __init__(self, demo, pending: int = None):
        self.demo = demo
        self.kernel = np.asarray(demo.beamfs[0].kernel, dtype=np.float32)
        self.K = len(self.kernel)
        self.rw = demo.beamfs[0].robust_width
        self.guard = 2 * self.rw
        self.pending = pending if pending is not None else 4 * self.rw
        self.num_mic = len(demo.geometry)
        self.bipolar = demo.bipolar_spikes

        # integrated-bandpass coefficient set per band (cumsum folded in):
        # the exact sequential CPU form.  On TPU the marginally-stable folded
        # filter does not survive float32 in lifted block form (CLAUDE.md), so
        # the TPU path runs the STABLE bandpass blocked (carried TDF2 state)
        # and the integrator as a carried-offset cumsum — mirroring the
        # offline pipeline's TPU branch.
        from ..ops.iir import _tdf2_matrices

        self._on_tpu = jax.default_backend() == "tpu"
        self._filters = []
        self._bp = []
        for b, a in demo.filterbank.ba_list:
            a_int = np.convolve(np.asarray(a), [1.0, -1.0])
            A, Bv, b0 = _tdf2_matrices(np.asarray(b), a_int)
            self._filters.append((A, Bv, b0, np.asarray(b), a_int))
            self._bp.append((np.asarray(b), np.asarray(a)))
        self.C = 2 * self.num_mic * len(self._filters)
        self.N_state = (
            len(self._bp[0][1]) - 1 if self._on_tpu else self._filters[0][0].shape[0]
        )

        cfg = demo.xylo_config
        self._cfg = cfg
        wr = np.asarray(cfg.w_rec)
        self._rec_coef = int(wr.flat[0]) if wr.size and np.all(wr == wr.flat[0]) else None
        if self._rec_coef is None:
            raise ValueError("streaming runtime supports uniform w_rec only")

    def init_state(self, batch: int = None) -> StreamState:
        """Fresh stream state; pass ``batch`` for N concurrent streams (the
        serving configuration — one vmapped step advances all of them)."""
        cfg = self._cfg
        n = cfg.n_hidden
        lead = () if batch is None else (batch,)
        z = lambda *s: jnp.zeros(lead + s, jnp.float32)
        zi = lambda *s: jnp.zeros(lead + s, jnp.int32)
        return StreamState(
            fir_tail=z(self.K - 1, self.num_mic),
            delay_line=z(self.K // 2, self.num_mic),
            iir_state=z(self.C // len(self._filters) * len(self._filters), self.N_state),
            int_carry=z(self.C),
            pending=z(self.guard + self.pending, self.C),
            isyn=zi(n),
            vmem=zi(n),
            spk=zi(n),
            counts=zi(n),
            steps=zi(),
        )

    @functools.cached_property
    def _make_steps(self):
        from ..ops.fir import fir_filter
        from ..ops.peaks import find_peaks_mask

        # NUMPY closures, deliberately: jit-lowering a function that closes
        # over a DEVICE-resident array performs a device->host download to
        # embed the literal, and the FIRST D2H in a process permanently
        # flips the tunneled axon backend into slow transfer mode
        # (~1.2 GB/s -> ~50 MB/s + ~20 ms/call on all subsequent transfers;
        # measured, see runtime/server.py).  Numpy closures lower without
        # any transfer.  Keeping this build path download-free lets the
        # serving warm-up (compiles + first uploads) run at fast-mode speed.
        kernel = np.asarray(self.kernel)
        K, rw, guard, pending = self.K, self.rw, self.guard, self.pending
        filters = self._filters
        num_mic = self.num_mic
        bipolar = self.bipolar
        cfg = self._cfg
        w_in = np.asarray(cfg.w_in, np.float32)
        dash_syn = np.asarray(cfg.dash_syn, np.int32)
        dash_mem = np.asarray(cfg.dash_mem, np.int32)
        threshold = np.asarray(cfg.threshold, np.int32)
        rec_coef = self._rec_coef

        def lif_scan(carry, inp_t):
            isyn, vmem, spk = carry
            cur = inp_t + rec_coef * jnp.sum(spk)
            isyn = jnp.clip(
                isyn - jax.lax.shift_right_arithmetic(isyn, dash_syn) + cur.astype(jnp.int32),
                -(2**15), 2**15 - 1,
            )
            vmem = jnp.clip(
                vmem - jax.lax.shift_right_arithmetic(vmem, dash_mem) + isyn,
                -(2**15), 2**15 - 1,
            )
            spk_new = (vmem >= threshold).astype(jnp.int32)
            vmem = vmem - spk_new * threshold
            return (isyn, vmem, spk_new), spk_new

        on_tpu = self._on_tpu
        bp_filters = self._bp

        def encode(state: StreamState, chunk):
            """Encode-only step: (state, (Tc, M) chunk) → (partial new state
            with LIF fields untouched, (Tc, 2C) spike raster)."""
            from ..ops.iir import iir_filter

            Tc = chunk.shape[0]
            # --- STHT streaming
            ext = jnp.concatenate([state.fir_tail, chunk], axis=0)
            fir_method = "blockmm" if on_tpu else "fft"
            quad = fir_filter(kernel, ext, axis=0, method=fir_method)[K - 1 :]
            line = jnp.concatenate([state.delay_line, chunk], axis=0)
            inphase = line[:Tc]
            new_delay = line[Tc:]
            new_tail = ext[-(K - 1) :]
            sig_real = jnp.concatenate([inphase, quad], axis=1)  # (Tc, 2M)

            # --- integrated bandpass per band with carried state
            outs = []
            states = []
            carries = []
            ch_per_band = 2 * num_mic
            for i, (A, Bv, b0, b, a_int) in enumerate(filters):
                zi = state.iir_state[i * ch_per_band : (i + 1) * ch_per_band]
                if on_tpu:
                    # stable bandpass + integrator fused in one lifted blocked
                    # pass (carried TDF2 state + running offset) — matches the
                    # offline TPU encode (ops/iir._iir_cumsum_blocked)
                    bb, aa = bp_filters[i]
                    carry = state.int_carry[i * ch_per_band : (i + 1) * ch_per_band]
                    # carried state pins the block size to a divisor of Tc;
                    # prefer 32 (the tuned default), else the nearest
                    # divisor — at fs=24 kHz Tc=6000 is NOT a multiple of 32
                    # and the old `Tc % 32` gate silently fell back to the
                    # sequential scan, making the 24 kHz streaming step 1.6x
                    # SLOWER than 48 kHz (measured 11.4 vs 7.1 ms/96 streams)
                    sb = next((s for s in (32, 48, 40, 24, 16, 8)
                               if Tc % s == 0), None)
                    if sb is not None:
                        zi_f = jnp.concatenate([zi, carry[:, None]], axis=1)
                        y, zf_f = iir_filter(
                            bb, aa, sig_real, axis=0, method="blocked_cumsum",
                            zi=zi_f, return_state=True, sb=sb,
                        )
                        zf = zf_f[:, :-1]
                        carries.append(zf_f[:, -1])
                    else:
                        y, zf = iir_filter(
                            bb, aa, sig_real, axis=0, method="scan",
                            zi=zi, return_state=True,
                        )
                        y = jnp.cumsum(y, axis=0) + carry[None, :]
                        carries.append(y[-1])
                else:
                    y, zf = iir_filter(
                        b, a_int, sig_real, axis=0, method="scan",
                        zi=zi, return_state=True,
                    )
                    carries.append(jnp.zeros(ch_per_band, y.dtype))
                outs.append(y)
                states.append(zf)
            integrated = jnp.concatenate(outs, axis=1)  # (Tc, C)
            new_iir = jnp.concatenate(states, axis=0)
            new_carry = jnp.concatenate(carries, axis=0)

            # --- RZCC with guard+pending seam
            analysis = jnp.concatenate([state.pending, integrated], axis=0)
            new_pending = analysis[Tc:]

            enc_state = state._replace(
                fir_tail=new_tail,
                delay_line=new_delay,
                iir_state=new_iir,
                int_carry=new_carry,
                pending=new_pending,
                steps=state.steps + Tc,
            )
            return enc_state, analysis

        def decide(analysis, Tc):
            """Seam spike decisions for one stream: (L, C) analysis window →
            (Tc, 2C or C) spike raster over [guard, guard + Tc)."""
            cs = analysis.T  # (C, guard+P+Tc)
            both = jnp.concatenate([cs, -cs], axis=0) if bipolar else cs
            masks = find_peaks_mask(both, rw, max_plateau=2 * rw)
            decided = masks[:, guard : guard + Tc]
            if bipolar:
                Cn = cs.shape[0]
                peaks, valleys = decided[:Cn], decided[Cn:]
                pos = (peaks & ~valleys).astype(jnp.int32)
                neg = valleys.astype(jnp.int32)
                return jnp.concatenate([pos.T, neg.T], axis=1)  # (Tc, 2C)
            return decided.T.astype(jnp.int32)

        def decide_batch_bipolar(analysis_b, Tc):
            """Batch-native bipolar seam decisions, time-major (L, B, C) →
            the two (Tc, B, C) polarity masks via the fully fused RZCC Pallas
            kernel (in-kernel extrema + suppression) — fed straight into the
            stateful bipolar LIF kernel, no combined raster materialized."""
            from ..ops.pallas.suppress_kernel import rzcc_encode_bipolar_tm

            L, B, C = analysis_b.shape
            kp, kn = rzcc_encode_bipolar_tm(analysis_b.reshape(L, B * C), rw, 2 * rw)
            kp = kp[guard : guard + Tc].reshape(Tc, B, C)
            kn = kn[guard : guard + Tc].reshape(Tc, B, C)
            return kp, kn

        def decide_batch_unipolar(analysis_b, Tc):
            # unipolar = the positive plane of the fused kernel (maxima of
            # +cs, heights +cs): one HBM pass, same as the offline pipeline
            from ..ops.pallas.suppress_kernel import rzcc_encode_bipolar_tm

            L, B, C = analysis_b.shape
            kp, _ = rzcc_encode_bipolar_tm(analysis_b.reshape(L, B * C), rw, 2 * rw)
            return kp[guard : guard + Tc].reshape(Tc, B, C).astype(jnp.int8)

        @jax.jit
        def step(state: StreamState, chunk):
            enc_state, analysis = encode(state, chunk)
            spikes = decide(analysis, chunk.shape[0])
            # --- integer LIF with carried state
            inp = jnp.dot(spikes.astype(jnp.float32), w_in, preferred_element_type=jnp.float32)
            (isyn, vmem, spk), spk_seq = jax.lax.scan(
                lif_scan, (state.isyn, state.vmem, state.spk), inp
            )
            return (
                enc_state._replace(
                    isyn=isyn, vmem=vmem, spk=spk,
                    counts=state.counts + jnp.sum(spk_seq, axis=0),
                ),
                spikes,
            )

        def _step_batched_body(state: StreamState, chunks, want_spikes: bool):
            """Serving path: vmapped encode + the stateful Pallas LIF kernel
            over the whole stream batch (identical integers to the scan)."""
            from ..ops.pallas.lif_kernel import (
                lif_count_stateful,
                lif_count_stateful_bipolar,
            )

            # analysis comes out time-major (L, B, C): the encode is naturally
            # (T, ...)-major, so out_axes=1 costs nothing and the fused RZCC +
            # LIF kernels consume their native layout with zero transposes
            enc_state, analysis_b = jax.vmap(encode, out_axes=(0, 1))(state, chunks)
            Tc = chunks.shape[1]
            # spike_bound=1: binary RZCC masks from stream start (state zeros),
            # so the no-saturation invariant carries across chunks
            if on_tpu and bipolar:
                kp, kn = decide_batch_bipolar(analysis_b, Tc)
                counts_new, isyn, vmem, spk = lif_count_stateful_bipolar(
                    cfg, kp, kn, state.isyn, state.vmem, state.spk, spike_bound=1
                )
                spikes = None
                if want_spikes:
                    pos = (kp & ~kn).astype(jnp.int8)
                    neg = kn.astype(jnp.int8)
                    spikes = jnp.concatenate([pos, neg], axis=-1)  # (Tc, B, 2C)
            else:
                if on_tpu:
                    spikes = decide_batch_unipolar(analysis_b, Tc)
                else:
                    spikes = jnp.transpose(
                        jax.vmap(lambda a: decide(a, Tc))(
                            jnp.transpose(analysis_b, (1, 0, 2))
                        ),
                        (1, 0, 2),
                    )
                counts_new, isyn, vmem, spk = lif_count_stateful(
                    cfg, spikes, state.isyn, state.vmem, state.spk,
                    spike_bound=1, time_major=True,
                )
            new_state = enc_state._replace(
                isyn=isyn, vmem=vmem, spk=spk, counts=state.counts + counts_new
            )
            if want_spikes:
                return new_state, spikes
            return new_state

        step_batched = jax.jit(
            functools.partial(_step_batched_body, want_spikes=True)
        )
        step_batched_nospikes = jax.jit(
            functools.partial(_step_batched_body, want_spikes=False)
        )

        return step, step_batched, step_batched_nospikes

    @property
    def _step_jit(self):
        return self._make_steps[0]

    @property
    def _step_jit_batched(self):
        return self._make_steps[1]

    @property
    def _step_jit_batched_nospikes(self):
        return self._make_steps[2]

    def process_chunk(self, state: StreamState, chunk, return_spikes: bool = True):
        """One chunk in, (new_state, decided input-spike raster) out.

        ``chunk`` may be (Tc, M) for a single stream or (B, Tc, M) matched to
        a ``init_state(batch=B)`` state — the serving path advances all B
        streams in one device launch.  Single-stream spikes come back
        (Tc, C'); batched spikes come back TIME-MAJOR (Tc, B, C') — the fused
        RZCC and LIF kernels' native layout, kept transpose-free end-to-end.

        ``return_spikes=False`` (batched only) skips materializing the spike
        raster — the serving loop needs only the carried counts, and on TPU
        the bipolar masks flow kernel-to-kernel without ever being combined.
        Returns just the new state in that case.
        """
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 3:
            if not return_spikes:
                return self._step_jit_batched_nospikes(state, chunk)
            return self._step_jit_batched(state, chunk)
        return self._step_jit(state, chunk)

    def make_sharded_step(self, mesh, axis_name: str = "data"):
        """Data-parallel serving step over a multi-chip ``jax.sharding.Mesh``.

        Streams are independent, so serving shards PERFECTLY data-parallel:
        carried state and chunks split on the stream axis and there are ZERO
        cross-device collectives — nothing rides ICI, scaling is linear by
        construction (the multi-chip twin of the single-chip serving loop the
        daemon drives; the reference's closest analogue is one sox capture at
        a time, micloc/record.py:54-60).  Each device runs the same fused
        encode→RZCC→LIF program on its ``B/n_devices`` slice; on TPU the
        per-shard batch should satisfy the Pallas batch-shape rules
        (``B/n % 4 == 0`` or 1 — see ops/pallas/lif_kernel.py).

        Returns a jitted ``(state, chunks) -> new_state`` operating on
        ``P(axis_name)``-sharded leading axes.  Validated against the
        unsharded step on the virtual 8-device CPU mesh in
        tests/test_streaming.py.
        """
        from jax.sharding import PartitionSpec as P

        body = self._make_steps[2]  # batched step, no spike materialization
        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=P(axis_name),
        )
        return jax.jit(fn)

    def rate(self, state: StreamState, fold: bool = True):
        """Current per-DoA spike-rate estimate from the accumulated counts
        (batched states give (B, G) rates; ``fold=False`` returns the
        unfolded (B, F·G) band-major rates that the stacked/auto matched
        estimators take)."""
        num_DoA = len(self.demo.doa_list)
        steps = jnp.maximum(state.steps, 1)
        r = state.counts.astype(jnp.float32) / steps[..., None] * self.demo.fs
        if not fold:
            return r
        return r.reshape(r.shape[:-1] + (-1, num_DoA)).mean(axis=-2)

    def estimate_doa(self, state: StreamState, method: str = "peak"):
        r = self.rate(state, fold=method not in ("matched_stacked", "matched_auto"))
        if r.ndim == 2:  # batched streams
            return jnp.stack(
                [self.demo.estimate_doa_from_rate(x, method) for x in r]
            )
        return self.demo.estimate_doa_from_rate(r, method)
