"""Pallas kernel: fused greedy distance suppression (time-major).

The XLA formulation of scipy's ``_select_by_peak_distance``
(ops/peaks.select_by_distance) runs each fixed-point round as ~3 dilated
shift-max pool chains over the full (rows, T) arrays, each pass materialized
to HBM — ~7 ms at flagship scale.  Here ONE round = ONE Pallas launch: the
masked window-max, rightmost-tie winner election and winner-window deletion
all happen in VMEM, so a round costs a single HBM sweep of the inputs.

Layout is deliberately **time-major (T, rows)**: window shifts along time are
then sublane shifts, which Mosaic handles natively — an earlier lane-axis
variant (time minor) was catastrophically slow (CLAUDE.md failed-experiments
note).  Rows ride the lane axis (128 per grid step); time is tiled in
``TB``-sample blocks with the previous/next blocks passed as halo (window
dependencies reach at most 3·w ≪ TB samples, so the center block's round
outputs are exactly the global round's).  The fixed-point loop wraps the
launch as a ``lax.while_loop``; oscillatory audio resolves in one round.

Semantics are identical to ``select_by_distance`` (window-maxima win, exact
ties resolved to the rightmost index, winners delete their windows, repeat
until no candidates remain) — parity-tested against the XLA version in
tests/test_pallas_suppress.py, including plateau/tie and dense-chain cases.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 128
TB = 1024  # time-block; must be >= 3*w + 8 for the halo argument


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_kernel(
    hp_ref, hc_ref, hn_ref,  # heights: prev/cur/next time blocks (TB, R)
    ap_ref, ac_ref, an_ref,  # active masks (int8)
    kept_ref,  # kept mask, cur block (int8)
    act_out_ref, kept_out_ref,
    *, w: int, T: int,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    R = hc_ref.shape[1]

    h3 = jnp.concatenate([hp_ref[:], hc_ref[:], hn_ref[:]], axis=0)
    # Mask plumbing stays in FLOAT arithmetic: Mosaic cannot truncate i8
    # vectors to i1, and XLA folds int-upcast-then-compare back into exactly
    # that truncation; booleans below only ever come from float/i32 compares.
    a3f = jnp.concatenate([ap_ref[:], ac_ref[:], an_ref[:]], axis=0).astype(jnp.float32)

    # positions; halo blocks clamped at the edges are masked inactive
    base = (t - 1) * TB
    iota = jax.lax.broadcasted_iota(jnp.int32, (3 * TB, R), 0) + base
    local = jax.lax.broadcasted_iota(jnp.int32, (3 * TB, R), 0)
    edge_ok = (iota >= 0) & (iota < T)
    a3f = a3f * edge_ok.astype(jnp.float32)
    a3f = jnp.where((t == 0) & (local < TB), 0.0, a3f)
    a3f = jnp.where((t == nt - 1) & (local >= 2 * TB), 0.0, a3f)

    NEG = jnp.float32(-3.0e38)

    def shift_down(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([pad, v[: 3 * TB - s]], axis=0)

    def shift_up(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([v[s:], pad], axis=0)

    def window_max(v, fill):
        """Max over [i-w, i+w] along time (sublanes): trailing then leading."""
        y = v
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            y = jnp.maximum(y, shift_down(y, step, fill))
            k += step
        z = y
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            z = jnp.maximum(z, shift_up(z, step, fill))
            k += step
        return z

    h = h3 * a3f + NEG * (1.0 - a3f)  # active ? h3 : -big (select-free)
    wmax = window_max(h, NEG)
    top = (h == wmax) & (a3f > 0.5)
    tid = jnp.where(top, iota, jnp.int32(-1))
    wtid = window_max(tid, jnp.int32(-1))
    winner = top & (wtid == iota)
    win_f = winner.astype(jnp.float32)
    in_win_f = window_max(win_f, jnp.float32(0.0))[TB : 2 * TB]

    acf = ac_ref[:].astype(jnp.float32)
    kpf = kept_ref[:].astype(jnp.float32)
    act_new = acf * (1.0 - in_win_f)
    kept_new = jnp.maximum(kpf, win_f[TB : 2 * TB])
    act_out_ref[:] = act_new.astype(jnp.int8)
    kept_out_ref[:] = kept_new.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _suppress_tm_impl(height_tm, cand_tm, w: int, interpret: bool = False):
    T, R = height_tm.shape
    Tp = _round_up(T, TB)
    Rp = _round_up(R, R_TILE)
    h = jnp.pad(height_tm.astype(jnp.float32), ((0, Tp - T), (0, Rp - R)))
    active0 = jnp.pad(cand_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    kept0 = jnp.zeros((Tp, Rp), jnp.int8)

    nt = Tp // TB
    kernel = functools.partial(_round_kernel, w=w, T=T)

    def blk(off):
        # prev/cur/next tilings; edge blocks clamp (masked inactive in-kernel)
        def index_map(t, r):
            return (jnp.clip(t + off, 0, nt - 1), r)

        return pl.BlockSpec((TB, R_TILE), index_map, memory_space=pltpu.VMEM)

    cur = pl.BlockSpec((TB, R_TILE), lambda t, r: (t, r), memory_space=pltpu.VMEM)

    round_call = pl.pallas_call(
        kernel,
        grid=(nt, Rp // R_TILE),
        in_specs=[blk(-1), blk(0), blk(+1), blk(-1), blk(0), blk(+1), cur],
        out_specs=(cur, cur),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Rp), jnp.int8),
            jax.ShapeDtypeStruct((Tp, Rp), jnp.int8),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )

    def cond(state):
        active, kept = state
        return jnp.any(active != 0)

    def body(state):
        active, kept = state
        return round_call(h, h, h, active, active, active, kept)

    _, kept = jax.lax.while_loop(cond, body, (active0, kept0))
    return kept[:T, :R]


def _round_kernel_bipolar(
    hp_ref, hc_ref, hn_ref,  # integrated signal cs: prev/cur/next (TB, R) f32
    pp_ref, pc_ref, pn_ref,  # active masks, positive polarity (int8)
    qp_ref, qc_ref, qn_ref,  # active masks, negative polarity (int8)
    kp_ref, kn_ref,  # kept masks, cur block (int8)
    pos_out_ref, neg_out_ref, kp_out_ref, kn_out_ref,
    *, w: int, T: int,
):
    """One suppression round for BOTH RZCC polarities from one read of cs.

    The bipolar encoder suppresses peaks of ``cs`` and of ``-cs``
    independently (micloc/spike_encoder.py:124-137); stacking them as rows
    would read the f32 signal twice — here the negative-polarity heights are
    just ``-cs`` in-register.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    R = hc_ref.shape[1]

    h3 = jnp.concatenate([hp_ref[:], hc_ref[:], hn_ref[:]], axis=0)
    base = (t - 1) * TB
    iota = jax.lax.broadcasted_iota(jnp.int32, (3 * TB, R), 0) + base
    local = jax.lax.broadcasted_iota(jnp.int32, (3 * TB, R), 0)
    edge_f = (
        ((iota >= 0) & (iota < T)).astype(jnp.float32)
        * jnp.where((t == 0) & (local < TB), 0.0, 1.0)
        * jnp.where((t == nt - 1) & (local >= 2 * TB), 0.0, 1.0)
    )

    NEG = jnp.float32(-3.0e38)

    def shift_down(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([pad, v[: 3 * TB - s]], axis=0)

    def shift_up(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([v[s:], pad], axis=0)

    def window_max(v, fill):
        y = v
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            y = jnp.maximum(y, shift_down(y, step, fill))
            k += step
        z = y
        k = 1
        while k < w + 1:
            step = min(k, w + 1 - k)
            z = jnp.maximum(z, shift_up(z, step, fill))
            k += step
        return z

    def one_polarity(signed_h, a_refs, k_ref):
        ap, ac, an = a_refs
        a3f = jnp.concatenate([ap[:], ac[:], an[:]], axis=0).astype(jnp.float32)
        a3f = a3f * edge_f
        h = signed_h * a3f + NEG * (1.0 - a3f)
        wmax = window_max(h, NEG)
        top = (h == wmax) & (a3f > 0.5)
        tid = jnp.where(top, iota, jnp.int32(-1))
        wtid = window_max(tid, jnp.int32(-1))
        winner = top & (wtid == iota)
        win_f = winner.astype(jnp.float32)
        in_win_f = window_max(win_f, jnp.float32(0.0))[TB : 2 * TB]
        acf = ac[:].astype(jnp.float32)
        kpf = k_ref[:].astype(jnp.float32)
        act_new = acf * (1.0 - in_win_f)
        kept_new = jnp.maximum(kpf, win_f[TB : 2 * TB])
        return act_new.astype(jnp.int8), kept_new.astype(jnp.int8)

    pos_act, pos_kept = one_polarity(h3, (pp_ref, pc_ref, pn_ref), kp_ref)
    neg_act, neg_kept = one_polarity(-h3, (qp_ref, qc_ref, qn_ref), kn_ref)
    pos_out_ref[:] = pos_act
    neg_out_ref[:] = neg_act
    kp_out_ref[:] = pos_kept
    kn_out_ref[:] = neg_kept


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _suppress_bipolar_impl(cs_tm, maxima_tm, minima_tm, w: int, interpret: bool = False):
    T, R = cs_tm.shape
    Tp = _round_up(T, TB)
    Rp = _round_up(R, R_TILE)
    h = jnp.pad(cs_tm.astype(jnp.float32), ((0, Tp - T), (0, Rp - R)))
    act_p = jnp.pad(maxima_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    act_n = jnp.pad(minima_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    kept0 = jnp.zeros((Tp, Rp), jnp.int8)

    nt = Tp // TB
    kernel = functools.partial(_round_kernel_bipolar, w=w, T=T)

    def blk(off):
        def index_map(t, r):
            return (jnp.clip(t + off, 0, nt - 1), r)

        return pl.BlockSpec((TB, R_TILE), index_map, memory_space=pltpu.VMEM)

    cur = pl.BlockSpec((TB, R_TILE), lambda t, r: (t, r), memory_space=pltpu.VMEM)

    round_call = pl.pallas_call(
        kernel,
        grid=(nt, Rp // R_TILE),
        in_specs=[blk(-1), blk(0), blk(+1)] * 3 + [cur, cur],
        out_specs=(cur, cur, cur, cur),
        out_shape=tuple(jax.ShapeDtypeStruct((Tp, Rp), jnp.int8) for _ in range(4)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )

    def cond(state):
        ap, an, kp, kn = state
        return jnp.any(ap != 0) | jnp.any(an != 0)

    def body(state):
        ap, an, kp, kn = state
        return round_call(h, h, h, ap, ap, ap, an, an, an, kp, kn)

    _, _, kp, kn = jax.lax.while_loop(cond, body, (act_p, act_n, kept0, kept0))
    return kp[:T, :R], kn[:T, :R]


def rzcc_select_bipolar_tm(cs_tm, maxima_tm, minima_tm, distance, interpret: bool = False):
    """Bipolar RZCC suppression, time-major: one read of the integrated
    signal serves both polarities (heights are ±cs in-register).

    Returns ``(kept_pos, kept_neg)`` bool masks of shape (T, rows) — exactly
    ``select_by_distance`` applied to (maxima, cs) and (minima, -cs).
    """
    w = int(np.ceil(distance)) - 1
    if w <= 0:
        return (
            jnp.asarray(maxima_tm, jnp.bool_),
            jnp.asarray(minima_tm, jnp.bool_),
        )
    if not interpret and jax.default_backend() != "tpu":
        from ..peaks import select_by_distance

        cs_rt = jnp.swapaxes(jnp.asarray(cs_tm), 0, -1)
        kp = select_by_distance(
            jnp.swapaxes(jnp.asarray(maxima_tm, jnp.bool_), 0, -1), cs_rt, distance
        )
        kn = select_by_distance(
            jnp.swapaxes(jnp.asarray(minima_tm, jnp.bool_), 0, -1), -cs_rt, distance
        )
        return jnp.swapaxes(kp, 0, -1), jnp.swapaxes(kn, 0, -1)
    if 3 * w + 8 > TB:
        raise ValueError(f"suppression window w={w} too large for time block {TB}")
    kp, kn = _suppress_bipolar_impl(
        jnp.asarray(cs_tm),
        jnp.asarray(maxima_tm),
        jnp.asarray(minima_tm),
        w=w,
        interpret=interpret,
    )
    return kp != 0, kn != 0


def select_by_distance_tm(cand_tm, height_tm, distance, interpret: bool = False):
    """Time-major greedy distance suppression: (T, rows) in, (T, rows) bool out.

    Pallas-fused on TPU (or ``interpret=True``); exact same semantics as
    ``ops.peaks.select_by_distance`` on the transposed arrays.
    """
    w = int(np.ceil(distance)) - 1
    if w <= 0:
        return jnp.asarray(cand_tm, jnp.bool_)
    if not interpret and jax.default_backend() != "tpu":
        from ..peaks import select_by_distance

        return jnp.swapaxes(
            select_by_distance(
                jnp.swapaxes(jnp.asarray(cand_tm, jnp.bool_), 0, -1),
                jnp.swapaxes(jnp.asarray(height_tm), 0, -1),
                distance,
            ),
            0,
            -1,
        )
    if 3 * w + 8 > TB:
        raise ValueError(f"suppression window w={w} too large for time block {TB}")
    out = _suppress_tm_impl(
        jnp.asarray(height_tm), jnp.asarray(cand_tm), w=w, interpret=interpret
    )
    return out != 0
