"""Parity tests for the fused time-major suppression kernel
(ops/pallas/suppress_kernel.py) vs the XLA reference formulation
(ops/peaks.select_by_distance), driven in interpret mode on CPU."""
import numpy as np
import jax.numpy as jnp

from haghighatshoarmuir2024_tpu.ops.peaks import (
    local_maxima_mask,
    select_by_distance,
)
from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import select_by_distance_tm


def xla_ref(cand_rt, height_rt, distance):
    return np.asarray(select_by_distance(jnp.asarray(cand_rt), jnp.asarray(height_rt), distance))


def fused(cand_rt, height_rt, distance):
    out = select_by_distance_tm(
        jnp.asarray(cand_rt.T), jnp.asarray(height_rt.T), distance, interpret=True
    )
    return np.asarray(out).T


def test_suppress_fused_random_signals():
    rng = np.random.default_rng(0)
    for trial in range(3):
        x = rng.standard_normal((5, 400)).astype(np.float32)
        x = np.cumsum(x, axis=-1)
        cand = np.asarray(local_maxima_mask(jnp.asarray(x)))
        for d in (1, 3, 7, 12):
            np.testing.assert_array_equal(fused(cand, x, d), xla_ref(cand, x, d))


def test_suppress_fused_dense_chains():
    # adversarial: candidates everywhere, long suppression chains -> many rounds
    rng = np.random.default_rng(1)
    h = rng.standard_normal((3, 257)).astype(np.float32)
    cand = np.ones_like(h, bool)
    for d in (2, 5, 11):
        np.testing.assert_array_equal(fused(cand, h, d), xla_ref(cand, h, d))


def test_suppress_fused_exact_ties_rightmost():
    # bit-identical heights inside one window: rightmost wins in both versions
    h = np.zeros((1, 64), np.float32)
    cand = np.zeros((1, 64), bool)
    h[0, [10, 15, 40, 45, 50]] = 1.0  # exact ties
    cand[0, [10, 15, 40, 45, 50]] = True
    for d in (6, 11, 40):
        np.testing.assert_array_equal(fused(cand, h, d), xla_ref(cand, h, d))


def test_suppress_fused_ragged_shapes():
    rng = np.random.default_rng(2)
    # T not multiple of 8, rows not multiple of the lane tile
    h = np.cumsum(rng.standard_normal((9, 203)).astype(np.float32), axis=-1)
    cand = np.asarray(local_maxima_mask(jnp.asarray(h)))
    np.testing.assert_array_equal(fused(cand, h, 5), xla_ref(cand, h, 5))


def test_suppress_fused_empty_and_full():
    h = np.linspace(0, 1, 100, dtype=np.float32)[None, :]
    cand = np.zeros((1, 100), bool)
    np.testing.assert_array_equal(fused(cand, h, 5), xla_ref(cand, h, 5))
    assert fused(cand, h, 5).sum() == 0


def test_rzcc_encode_fully_fused_matches_xla():
    """The in-kernel extrema + suppression (rzcc_encode_bipolar_tm) equals the
    XLA composition local_extrema_mask_bounded → select_by_distance exactly,
    including plateaus and both polarities."""
    from haghighatshoarmuir2024_tpu.ops.peaks import local_extrema_mask_bounded
    from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (
        rzcc_encode_bipolar_tm,
    )

    rng = np.random.default_rng(11)
    for trial, (rows, T) in enumerate([(6, 500), (3, 257), (9, 2050)]):
        cs = np.cumsum(rng.standard_normal((rows, T)).astype(np.float32), axis=-1)
        if trial == 1:
            # inject exact plateaus (runs of equal values) to exercise the
            # bounded plateau-midpoint logic
            cs[:, 40:44] = cs[:, 40:41]
            cs[:, 100:103] = cs[:, 100:101]
        for d, W in ((3, 6), (7, 14), (12, 24)):
            maxima, minima = local_extrema_mask_bounded(jnp.asarray(cs), W)
            kp, kn = rzcc_encode_bipolar_tm(jnp.asarray(cs.T), d, W, interpret=True)
            np.testing.assert_array_equal(
                np.asarray(kp).T, xla_ref(np.asarray(maxima), cs, d)
            )
            np.testing.assert_array_equal(
                np.asarray(kn).T, xla_ref(np.asarray(minima), -cs, d)
            )


def test_rzcc_encode_fused_large_window_single_round():
    """Regression: widening suppression windows must DEGRADE the fused
    encoder exactly, never clamp a halo (clamped halos silently finalize
    wrong kept bits the fallback loop cannot undo).  _pick_tb's ladder:

      * w=23/W=48 (3-band 500-3000 Hz speech config): 2 fused rounds still,
        but the time block shrinks 1536 -> 1280 so the 256-row halo fits the
        scoped-VMEM budget (the r3 OOM: 16.25M > 16M at TB=1536);
      * w=79: the 2-round margin forces an unaffordable halo -> ONE fused
        round at a 512-row block, fallback rounds finish the fixed point;
      * w=299: even one round cannot fit -> exact XLA fallback path.
    """
    from haghighatshoarmuir2024_tpu.ops.peaks import local_extrema_mask_bounded
    from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (
        _pick_tb,
        rzcc_encode_bipolar_tm,
    )
    import pytest

    assert _pick_tb(23, 48) == (1280, 2, 256)
    assert _pick_tb(79, 24) == (512, 1, 512)
    with pytest.raises(ValueError, match="scoped-VMEM"):
        _pick_tb(299, 24)

    rng = np.random.default_rng(17)
    # slow drift + noise => widely-spaced extrema whose suppression chains
    # cross the time-block boundary (T spans several shrunken blocks)
    t = np.arange(4000, dtype=np.float32)
    cs = np.cumsum(
        np.sin(2 * np.pi * t / 900.0)[None, :]
        + 0.3 * rng.standard_normal((3, 4000)).astype(np.float32),
        axis=-1,
    )
    for d, W in ((24, 48), (80, 24), (300, 24)):
        maxima, minima = local_extrema_mask_bounded(jnp.asarray(cs), W)
        kp, kn = rzcc_encode_bipolar_tm(jnp.asarray(cs.T), d, W, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(kp).T, xla_ref(np.asarray(maxima), cs, d)
        )
        np.testing.assert_array_equal(
            np.asarray(kn).T, xla_ref(np.asarray(minima), -cs, d)
        )


def test_rzcc_bipolar_fused_matches_xla():
    from haghighatshoarmuir2024_tpu.ops.peaks import local_extrema_mask_bounded
    from haghighatshoarmuir2024_tpu.ops.pallas.suppress_kernel import (
        rzcc_select_bipolar_tm,
    )

    rng = np.random.default_rng(5)
    cs = np.cumsum(rng.standard_normal((6, 500)).astype(np.float32), axis=-1)
    maxima, minima = local_extrema_mask_bounded(jnp.asarray(cs), 24)
    for d in (3, 7, 12):
        kp, kn = rzcc_select_bipolar_tm(
            jnp.asarray(cs.T), jnp.asarray(np.asarray(maxima).T),
            jnp.asarray(np.asarray(minima).T), d, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(kp).T, xla_ref(np.asarray(maxima), cs, d))
        np.testing.assert_array_equal(np.asarray(kn).T, xla_ref(np.asarray(minima), -cs, d))
