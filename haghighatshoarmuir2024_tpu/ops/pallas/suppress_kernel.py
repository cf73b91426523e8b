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
TB = 1536  # time-block (v5e scoped-VMEM fits <=~1536; 2048 OOMs at the 16 MB cap)
# Largest extended block (time block + both halos) that fits the 16 MB
# scoped VMEM: measured working at the flagship w=11/W=24 (TB 1536 + 2x128
# halo).  Wider suppression windows (lower bands -> larger robust_width)
# need 256-row halos, which at TB=1536 overflow by ~0.25 MB (measured:
# 3-band 500-3000 Hz encode, w=23/W=48 -> "Scoped allocation 16.25M >
# 16.00M") — _pick_tb shrinks the time block to keep this footprint.
TBE_MAX = 1792


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _halo_block(margin: int, tb: int = TB) -> int:
    """Smallest power-of-two multiple of 128 that covers ``margin`` and
    divides ``tb`` — the halo inputs are fetched as blocks of this size
    instead of full time blocks (2-3x less DMA per round).  Falls back to
    full blocks when no such divisor exists."""
    mb = 128
    while mb < margin:
        mb *= 2
    if mb >= tb or tb % mb:
        return tb
    return mb


def _pick_tb(w: int, W: int):
    """(time block, fused rounds, halo block) for the fused bipolar encode,
    keeping the extended block tb + 2*mb <= TBE_MAX so the kernel fits the
    scoped-VMEM cap at any robust_width.  Prefers 2 fused rounds; falls back
    to 1 when the 2-round margin forces a halo too large to fit."""
    for rounds in (2, 1):
        m = _margin(w, W, rounds=rounds)
        mb = 128
        while mb < m:
            mb *= 2
        tb = ((TBE_MAX - 2 * mb) // mb) * mb
        if tb >= mb and m <= tb:
            return tb, rounds, mb
    raise ValueError(
        f"suppression window w={w} / plateau bound W={W} too large for the "
        f"fused encode kernel (halo exceeds the scoped-VMEM block budget)"
    )


def _pick_tb1(w: int):
    """(time block, halo block) for the single-round suppression kernels,
    same scoped-VMEM budget rule as :func:`_pick_tb`."""
    m = _margin(w)
    mb = 128
    while mb < m:
        mb *= 2
    tb = ((TBE_MAX - 2 * mb) // mb) * mb
    if tb < mb or m > tb:
        raise ValueError(
            f"suppression window w={w} too large for the scoped-VMEM block budget"
        )
    return tb, mb


def _margin(w: int, W: int = 0, rounds: int = 1) -> int:
    """Halo margin (samples) that makes the center block's outputs exact:
    each suppression round chains three w-windows (wmax → tie-id → deletion)
    and the in-kernel extrema reach ``W + 1`` — everything past
    ``rounds·3(w+1) + W + 1`` cannot influence the center block.  Rounded up
    to the sublane tile."""
    return _round_up(W + 1 + rounds * 3 * (w + 1) + 8, 8)


def _halo_specs(MB: int, Tp: int, tb: int = TB):
    """(prev, cur, next) BlockSpecs where the halos are MB-row blocks taken
    from the tail/head of the neighbouring ``tb`` block (MB divides tb, so
    the halo lands on an MB-aligned block index).  Clamped edge halos contain
    arbitrary rows; the kernels mask them off by global position."""
    q = tb // MB
    nb = Tp // MB
    prev = pl.BlockSpec(
        (MB, R_TILE), lambda t, r: (jnp.maximum(t * q - 1, 0), r),
        memory_space=pltpu.VMEM,
    )
    cur = pl.BlockSpec((tb, R_TILE), lambda t, r: (t, r), memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec(
        (MB, R_TILE), lambda t, r: (jnp.minimum(t * q + q, nb - 1), r),
        memory_space=pltpu.VMEM,
    )
    return prev, cur, nxt


def _round_kernel(
    hp_ref, hc_ref, hn_ref,  # heights: prev/cur/next time blocks (TB, R)
    ap_ref, ac_ref, an_ref,  # active masks (int8)
    kept_ref,  # kept mask, cur block (int8)
    act_out_ref, kept_out_ref, flag_out_ref,
    *, w: int, T: int, M: int, tb: int = TB,
):
    t = pl.program_id(0)
    R = hc_ref.shape[1]
    TBe = tb + 2 * M  # M-row halo blocks, not full blocks: less DMA + VPU

    h3 = jnp.concatenate([hp_ref[:], hc_ref[:], hn_ref[:]], axis=0)
    # Mask plumbing stays in FLOAT arithmetic: Mosaic cannot truncate i8
    # vectors to i1, and XLA folds int-upcast-then-compare back into exactly
    # that truncation; booleans below only ever come from float/i32 compares.
    a3f = jnp.concatenate([ap_ref[:], ac_ref[:], an_ref[:]], axis=0).astype(
        jnp.float32
    )

    # positions; clamped edge blocks land outside [0, T) and are masked off
    base = t * tb - M
    iota = jax.lax.broadcasted_iota(jnp.int32, (TBe, R), 0) + base
    a3f = a3f * ((iota >= 0) & (iota < T)).astype(jnp.float32)

    NEG = jnp.float32(-3.0e38)

    def shift_down(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([pad, v[: TBe - s]], axis=0)

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

    def leading_any(v, L):
        # max over (p, p+L] — one-directional, half the cost of a full window
        z = shift_up(v, 1, jnp.float32(0.0))
        k = 1
        while k < L:
            step = min(k, L - k)
            z = jnp.maximum(z, shift_up(z, step, jnp.float32(0.0)))
            k += step
        return z

    h = h3 * a3f + NEG * (1.0 - a3f)  # active ? h3 : -big (select-free)
    wmax = window_max(h, NEG)
    top = (h == wmax) & (a3f > 0.5)
    # two window-maxima within w samples provably tie in height, so the
    # rightmost wins: winner = top with NO top strictly to its right within w
    top_f = top.astype(jnp.float32)
    winner = top & (leading_any(top_f, w) < 0.5)
    win_f = winner.astype(jnp.float32)
    in_win_f = window_max(win_f, jnp.float32(0.0))[M : M + tb]

    acf = ac_ref[:].astype(jnp.float32)
    kpf = kept_ref[:].astype(jnp.float32)
    act_new = acf * (1.0 - in_win_f)
    kept_new = jnp.maximum(kpf, win_f[M : M + tb])
    act_out_ref[:] = act_new.astype(jnp.int8)
    kept_out_ref[:] = kept_new.astype(jnp.int8)
    flag_out_ref[t, pl.program_id(1)] = jnp.max(act_new).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _suppress_tm_impl(height_tm, cand_tm, w: int, interpret: bool = False):
    tb, MB = _pick_tb1(w)
    T, R = height_tm.shape
    Tp = _round_up(T, tb)
    Rp = _round_up(R, R_TILE)
    h = jnp.pad(height_tm.astype(jnp.float32), ((0, Tp - T), (0, Rp - R)))
    active0 = jnp.pad(cand_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    kept0 = jnp.zeros((Tp, Rp), jnp.int8)

    nt = Tp // tb
    kernel = functools.partial(_round_kernel, w=w, T=T, M=MB, tb=tb)
    prev, cur, nxt = _halo_specs(MB, Tp, tb)

    nr = Rp // R_TILE
    flag = pl.BlockSpec(memory_space=pltpu.SMEM)
    round_call = pl.pallas_call(
        kernel,
        grid=(nt, nr),
        in_specs=[prev, cur, nxt, prev, cur, nxt, cur],
        out_specs=(cur, cur, flag),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Rp), jnp.int8),
            jax.ShapeDtypeStruct((Tp, Rp), jnp.int8),
            jax.ShapeDtypeStruct((nt, nr), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )

    def cond(state):
        active, kept, flags = state
        return jnp.any(flags != 0)

    def body(state):
        active, kept, flags = state
        return round_call(h, h, h, active, active, active, kept)

    flags0 = jnp.ones((nt, nr), jnp.int32)  # enter the loop at least once
    _, kept, _ = jax.lax.while_loop(cond, body, (active0, kept0, flags0))
    return kept[:T, :R]


def _round_kernel_bipolar(
    hp_ref, hc_ref, hn_ref,  # integrated signal cs: prev/cur/next (TB, R) f32
    pp_ref, pc_ref, pn_ref,  # active masks, positive polarity (int8)
    qp_ref, qc_ref, qn_ref,  # active masks, negative polarity (int8)
    kp_ref, kn_ref,  # kept masks, cur block (int8)
    pos_out_ref, neg_out_ref, kp_out_ref, kn_out_ref, flag_out_ref,
    *, w: int, T: int, M: int, tb: int = TB,
):
    """One suppression round for BOTH RZCC polarities from one read of cs.

    The bipolar encoder suppresses peaks of ``cs`` and of ``-cs``
    independently (micloc/spike_encoder.py:124-137); stacking them as rows
    would read the f32 signal twice — here the negative-polarity heights are
    just ``-cs`` in-register.
    """
    t = pl.program_id(0)
    R = hc_ref.shape[1]
    TBe = tb + 2 * M

    h3 = jnp.concatenate([hp_ref[:], hc_ref[:], hn_ref[:]], axis=0)
    base = t * tb - M
    iota = jax.lax.broadcasted_iota(jnp.int32, (TBe, R), 0) + base
    edge_f = ((iota >= 0) & (iota < T)).astype(jnp.float32)

    NEG = jnp.float32(-3.0e38)

    def shift_down(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([pad, v[: TBe - s]], axis=0)

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

    def leading_any(v, L):
        z = shift_up(v, 1, jnp.float32(0.0))
        k = 1
        while k < L:
            step = min(k, L - k)
            z = jnp.maximum(z, shift_up(z, step, jnp.float32(0.0)))
            k += step
        return z

    def one_polarity(signed_h, a_refs, k_ref):
        ap, ac, an = a_refs
        a3f = jnp.concatenate([ap[:], ac[:], an[:]], axis=0).astype(jnp.float32)
        a3f = a3f * edge_f
        h = signed_h * a3f + NEG * (1.0 - a3f)
        wmax = window_max(h, NEG)
        top = (h == wmax) & (a3f > 0.5)
        top_f = top.astype(jnp.float32)
        winner = top & (leading_any(top_f, w) < 0.5)
        win_f = winner.astype(jnp.float32)
        in_win_f = window_max(win_f, jnp.float32(0.0))[M : M + tb]
        acf = ac[:].astype(jnp.float32)
        kpf = k_ref[:].astype(jnp.float32)
        act_new = acf * (1.0 - in_win_f)
        kept_new = jnp.maximum(kpf, win_f[M : M + tb])
        return act_new.astype(jnp.int8), kept_new.astype(jnp.int8)

    pos_act, pos_kept = one_polarity(h3, (pp_ref, pc_ref, pn_ref), kp_ref)
    neg_act, neg_kept = one_polarity(-h3, (qp_ref, qc_ref, qn_ref), kn_ref)
    pos_out_ref[:] = pos_act
    neg_out_ref[:] = neg_act
    kp_out_ref[:] = pos_kept
    kn_out_ref[:] = neg_kept
    flag_out_ref[t, pl.program_id(1)] = (
        jnp.max(pos_act.astype(jnp.int32)) + jnp.max(neg_act.astype(jnp.int32))
    )


def _round_kernel_bipolar_first(
    hp_ref, hc_ref, hn_ref,  # integrated signal cs: prev/cur/next (TB, R) f32
    pos_out_ref, neg_out_ref, kp_out_ref, kn_out_ref, flag_out_ref,
    *, w: int, W: int, T: int, M: int, rounds: int = 2, tb: int = TB,
):
    """Fused RZCC round 1: bounded-plateau extrema of ±cs computed IN-REGISTER
    from the signal halos, then one suppression round for both polarities —
    the XLA extrema pass (ops/peaks.local_extrema_mask_bounded) and its two
    HBM mask round-trips disappear; round 1 reads ONLY the f32 signal.

    The extrema logic mirrors ``local_extrema_mask_bounded`` exactly (sign-
    encoded boundary indices, trailing-max/leading-min over the plateau bound
    ``W``, plateau-midpoint test); extrema are valid wherever the round-1
    window ops read them because the margin ``M ≥ W + 1 + 3(w+1)`` covers the
    full chain of window dependencies.
    """
    t = pl.program_id(0)
    R = hc_ref.shape[1]
    TBe = tb + 2 * M

    h3 = jnp.concatenate([hp_ref[:], hc_ref[:], hn_ref[:]], axis=0)
    base = t * tb - M
    iota = jax.lax.broadcasted_iota(jnp.int32, (TBe, R), 0) + base
    local = jax.lax.broadcasted_iota(jnp.int32, (TBe, R), 0)

    NEG = jnp.float32(-3.0e38)
    BIG = jnp.int32(2**30)

    def shift_down(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([pad, v[: TBe - s]], axis=0)

    def shift_up(v, s, fill):
        pad = jnp.full((s, R), fill, v.dtype)
        return jnp.concatenate([v[s:], pad], axis=0)

    def trailing_max(v, L, fill):
        y = v
        k = 1
        while k < L:
            step = min(k, L - k)
            y = jnp.maximum(y, shift_down(y, step, fill))
            k += step
        return y

    def leading_min(v, L, fill):
        y = v
        k = 1
        while k < L:
            step = min(k, L - k)
            y = jnp.minimum(y, shift_up(y, step, fill))
            k += step
        return y

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

    # --- bounded-plateau extrema from the signal (d[i] = sign(h[i+1] - h[i]))
    d = jnp.sign(shift_up(h3, 1, jnp.float32(0.0)) - h3)
    valid_d = (iota >= 0) & (iota < T - 1) & (local < TBe - 1)
    rise = valid_d & (d > 0.0)
    fall = valid_d & (d < 0.0)
    enc = jnp.where(rise, 2 * iota + 1, jnp.where(fall, 2 * iota, jnp.int32(-1)))
    encN = jnp.where(rise, 2 * iota + 1, jnp.where(fall, 2 * iota, BIG))

    last = shift_down(trailing_max(enc, W, jnp.int32(-1)), 1, jnp.int32(-1))
    nxt = leading_min(encN, W, BIG)

    has_last = last >= 0
    last_rise = has_last & ((last & 1) == 1)
    has_next = nxt < BIG
    next_fall = has_next & ((nxt & 1) == 0)
    l = (last >> 1) + 1
    r = nxt >> 1
    mid_ok = iota == ((l + r) >> 1)

    maxima = last_rise & next_fall & mid_ok
    minima = has_last & (~last_rise) & has_next & (~next_fall) & mid_ok

    # --- suppression rounds, candidates in-register (the margin covers the
    # 2-round chain, so the fused rounds are exactly the launched rounds)
    def leading_any(v, L):
        z = shift_up(v, 1, jnp.float32(0.0))
        k = 1
        while k < L:
            step = min(k, L - k)
            z = jnp.maximum(z, shift_up(z, step, jnp.float32(0.0)))
            k += step
        return z

    def one_round(signed_h, act, kept):
        h = signed_h * act + NEG * (1.0 - act)
        wmax = window_max(h, NEG)
        top = (h == wmax) & (act > 0.5)
        top_f = top.astype(jnp.float32)
        winner = top & (leading_any(top_f, w) < 0.5)
        win_f = winner.astype(jnp.float32)
        in_win_f = window_max(win_f, jnp.float32(0.0))
        return act * (1.0 - in_win_f), jnp.maximum(kept, win_f)

    z0 = jnp.zeros((TBe, R), jnp.float32)
    ap1, kp1 = one_round(h3, maxima.astype(jnp.float32), z0)
    an1, kn1 = one_round(-h3, minima.astype(jnp.float32), z0)

    # ids hoisted out of the pl.when branch: program_id has no lowering
    # inside cond branches in interpret mode
    ri = pl.program_id(1)

    def write_out(ap, an, kp, kn):
        pos_out_ref[:] = ap[M : M + tb].astype(jnp.int8)
        neg_out_ref[:] = an[M : M + tb].astype(jnp.int8)
        kp_out_ref[:] = kp[M : M + tb].astype(jnp.int8)
        kn_out_ref[:] = kn[M : M + tb].astype(jnp.int8)
        # per-block remaining-candidates flag: the fixed-point cond reads
        # this (nt, nr) int32 array instead of re-scanning masks from HBM
        flag_out_ref[t, ri] = (
            jnp.max(ap[M : M + tb]) + jnp.max(an[M : M + tb])
        ).astype(jnp.int32)

    write_out(ap1, an1, kp1, kn1)

    if rounds >= 2:
        # round 2 runs ONLY in blocks where round 1 left candidates anywhere
        # in the extended window (candidates beyond it cannot reach this
        # center); oscillatory audio resolves round 1 almost everywhere, so
        # most blocks skip ~40% of the kernel's VPU work.  The caller fuses
        # round 2 only when the 2-round margin fits the time block — a
        # clamped halo here would silently finalize wrong kept bits (the
        # fallback loop cannot undo them).
        rem1 = jnp.max(ap1) + jnp.max(an1)

        @pl.when(rem1 > 0.0)
        def _():
            ap2, kp2 = one_round(h3, ap1, kp1)
            an2, kn2 = one_round(-h3, an1, kn1)
            write_out(ap2, an2, kp2, kn2)


@functools.partial(jax.jit, static_argnames=("w", "W", "interpret"))
def _rzcc_bipolar_fused_impl(cs_tm, w: int, W: int, interpret: bool = False):
    # Two fused rounds when the 2-round halo margin fits the scoped-VMEM
    # budget: audio's candidate chains resolve in 2, so the fallback loop
    # below is a no-op in practice (its cond reads only the tiny per-block
    # flag array, not the full masks).  A clamped halo would silently
    # finalize wrong kept bits (the fallback loop cannot undo them), so
    # _pick_tb shrinks the time block — never the halo — and drops to one
    # fused round only when even that cannot fit.
    tb, ROUNDS, MB1 = _pick_tb(w, W)

    T, R = cs_tm.shape
    Tp = _round_up(T, tb)
    Rp = _round_up(R, R_TILE)
    h = jnp.pad(cs_tm.astype(jnp.float32), ((0, Tp - T), (0, Rp - R)))

    nt = Tp // tb
    nr = Rp // R_TILE
    flag = pl.BlockSpec(memory_space=pltpu.SMEM)
    mask_shape = jax.ShapeDtypeStruct((Tp, Rp), jnp.int8)
    flag_shape = jax.ShapeDtypeStruct((nt, nr), jnp.int32)

    prev1, cur, nxt1 = _halo_specs(MB1, Tp, tb)
    first_call = pl.pallas_call(
        functools.partial(
            _round_kernel_bipolar_first, w=w, W=W, T=T, M=MB1, rounds=ROUNDS,
            tb=tb,
        ),
        grid=(nt, nr),
        in_specs=[prev1, cur, nxt1],
        out_specs=(cur, cur, cur, cur, flag),
        out_shape=(mask_shape,) * 4 + (flag_shape,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )
    act_p, act_n, kp0, kn0, flags0 = first_call(h, h, h)

    MB = _halo_block(_margin(w), tb)
    prev, cur2, nxt = _halo_specs(MB, Tp, tb)
    round_call = pl.pallas_call(
        functools.partial(_round_kernel_bipolar, w=w, T=T, M=MB, tb=tb),
        grid=(nt, nr),
        in_specs=[prev, cur2, nxt] * 3 + [cur, cur],
        out_specs=(cur, cur, cur, cur, flag),
        out_shape=(mask_shape,) * 4 + (flag_shape,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )

    def cond(state):
        ap, an, kp, kn, flags = state
        return jnp.any(flags != 0)

    def body(state):
        ap, an, kp, kn, flags = state
        return round_call(h, h, h, ap, ap, ap, an, an, an, kp, kn)

    _, _, kp, kn, _ = jax.lax.while_loop(
        cond, body, (act_p, act_n, kp0, kn0, flags0)
    )
    return kp[:T, :R], kn[:T, :R]


def rzcc_encode_bipolar_tm(cs_tm, distance, max_plateau: int, interpret: bool = False):
    """Fully fused bipolar RZCC spike extraction, time-major: bounded-plateau
    extrema of ±cs AND the greedy distance suppression in one Pallas program
    family — round 1 reads only the integrated signal.

    Exactly equals ``local_extrema_mask_bounded(cs, max_plateau)`` followed by
    ``select_by_distance`` on each polarity (parity-tested).  Returns
    ``(kept_pos, kept_neg)`` bool masks of shape (T, rows).
    """
    w = int(np.ceil(distance)) - 1
    W = int(max_plateau)
    if not interpret and (jax.default_backend() != "tpu" or w <= 0):
        from ..peaks import local_extrema_mask_bounded

        cs_rt = jnp.swapaxes(jnp.asarray(cs_tm), 0, -1)
        maxima, minima = local_extrema_mask_bounded(cs_rt, W)
        return rzcc_select_bipolar_tm(
            cs_tm,
            jnp.swapaxes(maxima, 0, -1),
            jnp.swapaxes(minima, 0, -1),
            distance,
        )
    try:
        _pick_tb(w, W)
    except ValueError:
        # extreme suppression window: even a one-round halo exceeds the
        # scoped-VMEM block budget — fall back to the exact (slower) XLA
        # extrema + suppression composition rather than erroring
        from ..peaks import local_extrema_mask_bounded

        cs_rt = jnp.swapaxes(jnp.asarray(cs_tm), 0, -1)
        maxima, minima = local_extrema_mask_bounded(cs_rt, W)
        return rzcc_select_bipolar_tm(
            cs_tm,
            jnp.swapaxes(maxima, 0, -1),
            jnp.swapaxes(minima, 0, -1),
            distance,
            interpret=interpret,
        )
    kp, kn = _rzcc_bipolar_fused_impl(jnp.asarray(cs_tm), w=w, W=W, interpret=interpret)
    return kp != 0, kn != 0


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _suppress_bipolar_impl(cs_tm, maxima_tm, minima_tm, w: int, interpret: bool = False):
    tb, MB = _pick_tb1(w)
    T, R = cs_tm.shape
    Tp = _round_up(T, tb)
    Rp = _round_up(R, R_TILE)
    h = jnp.pad(cs_tm.astype(jnp.float32), ((0, Tp - T), (0, Rp - R)))
    act_p = jnp.pad(maxima_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    act_n = jnp.pad(minima_tm.astype(jnp.int8), ((0, Tp - T), (0, Rp - R)))
    kept0 = jnp.zeros((Tp, Rp), jnp.int8)

    nt = Tp // tb
    kernel = functools.partial(_round_kernel_bipolar, w=w, T=T, M=MB, tb=tb)
    prev, cur, nxt = _halo_specs(MB, Tp, tb)

    nr = Rp // R_TILE
    flag = pl.BlockSpec(memory_space=pltpu.SMEM)
    round_call = pl.pallas_call(
        kernel,
        grid=(nt, nr),
        in_specs=[prev, cur, nxt] * 3 + [cur, cur],
        out_specs=(cur, cur, cur, cur, flag),
        out_shape=tuple(jax.ShapeDtypeStruct((Tp, Rp), jnp.int8) for _ in range(4))
        + (jax.ShapeDtypeStruct((nt, nr), jnp.int32),),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )

    def cond(state):
        ap, an, kp, kn, flags = state
        return jnp.any(flags != 0)

    def body(state):
        ap, an, kp, kn, flags = state
        return round_call(h, h, h, ap, ap, ap, an, an, an, kp, kn)

    flags0 = jnp.ones((nt, nr), jnp.int32)  # enter the loop at least once
    _, _, kp, kn, _ = jax.lax.while_loop(
        cond, body, (act_p, act_n, kept0, kept0, flags0)
    )
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
    try:
        _pick_tb1(w)
    except ValueError:
        # extreme window: halo cannot fit the scoped-VMEM budget — exact XLA
        from ..peaks import select_by_distance

        cs_rt = jnp.swapaxes(jnp.asarray(cs_tm), 0, -1)
        kp = select_by_distance(
            jnp.swapaxes(jnp.asarray(maxima_tm, jnp.bool_), 0, -1), cs_rt, distance
        )
        kn = select_by_distance(
            jnp.swapaxes(jnp.asarray(minima_tm, jnp.bool_), 0, -1), -cs_rt, distance
        )
        return jnp.swapaxes(kp, 0, -1), jnp.swapaxes(kn, 0, -1)
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
    try:
        _pick_tb1(w)
    except ValueError:
        # extreme window: halo cannot fit the scoped-VMEM budget — exact XLA
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
    out = _suppress_tm_impl(
        jnp.asarray(height_tm), jnp.asarray(cand_tm), w=w, interpret=interpret
    )
    return out != 0
