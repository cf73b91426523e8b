"""Parity tests for the Pallas integer-LIF kernels (ops/pallas/lif_kernel.py).

The kernels produce every benchmark number, so their integer dynamics must be
IDENTICAL to the lax.scan simulator (models/xylo/sim._sim_hidden) that the
golden tests validate.  On CPU the public wrappers fall back to the scan, so
these tests drive the Pallas kernels themselves through ``interpret=True`` —
same kernel code, interpreted — across random configs including saturation,
nonzero recurrence, ragged T (not divisible by the time chunk) and carried
state.  The compiled (non-interpret) paths are covered on the real chip by
``tests_tpu/test_device_parity.py`` (run ``python -m pytest tests_tpu/ -q``
outside this CPU-forced suite).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from haghighatshoarmuir2024_tpu.models.xylo.quantize import XyloConfig
from haghighatshoarmuir2024_tpu.models.xylo.sim import sim_hidden_batch, _sim_hidden
from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import (
    _lif_count_impl,
    _lif_count_stateful_impl,
    lif_count_rates,
)


def make_config(seed, C=12, N=20, rec_coef=0, w_scale=20):
    rng = np.random.default_rng(seed)
    w_in = rng.integers(-w_scale, w_scale + 1, size=(C, N)).astype(np.int32)
    w_rec = np.full((N, N), rec_coef, np.int32)
    return XyloConfig(
        w_in=w_in,
        w_rec=w_rec,
        w_out=np.ones((N, 1), np.int32),
        dash_syn=rng.integers(1, 7, size=N).astype(np.int32),
        dash_mem=rng.integers(1, 7, size=N).astype(np.int32),
        dash_syn_out=np.ones(1, np.int32),
        dash_mem_out=np.ones(1, np.int32),
        threshold=rng.integers(30, 200, size=N).astype(np.int32),
        threshold_out=np.ones(1, np.int32),
        dt=1e-3,
        weight_scale=1.0,
    )


def make_spikes(seed, B=3, T=50, C=12, p=0.15, max_count=2):
    rng = np.random.default_rng(seed + 1000)
    return (rng.random((B, T, C)) < p).astype(np.int32) * rng.integers(
        1, max_count + 1, size=(B, T, C)
    ).astype(np.int32)


def pallas_counts(config, spikes_btc, time_chunk=8, int8_mm=None):
    """Drive the count kernel in interpret mode (the TPU wrapper's core)."""
    wr = np.asarray(config.w_rec)
    rec_coef = int(wr.flat[0]) if wr.size else 0
    if int8_mm is None:  # same guard as the lif_count_rates wrapper
        int8_mm = bool(np.all(np.abs(np.asarray(config.w_in)) <= 127))
    spikes_tbc = jnp.transpose(jnp.asarray(spikes_btc, jnp.int32), (1, 0, 2))
    return np.asarray(
        _lif_count_impl(
            spikes_tbc,
            jnp.asarray(config.w_in, jnp.int32),
            jnp.asarray(config.dash_syn, jnp.int32),
            jnp.asarray(config.dash_mem, jnp.int32),
            jnp.asarray(config.threshold, jnp.int32),
            rec_coef=rec_coef,
            time_chunk=time_chunk,
            interpret=True,
            int8_mm=int8_mm,
        )
    )


def scan_counts(config, spikes_btc):
    return np.asarray(sim_hidden_batch(config, jnp.asarray(spikes_btc)).sum(axis=1))


@pytest.mark.parametrize("seed,rec_coef", [(0, 0), (1, -3), (2, -1), (3, 0)])
def test_lif_count_interpret_matches_scan(seed, rec_coef):
    config = make_config(seed, rec_coef=rec_coef)
    spikes = make_spikes(seed)
    np.testing.assert_array_equal(pallas_counts(config, spikes), scan_counts(config, spikes))


def test_lif_count_interpret_ragged_T():
    # T = 53 with time_chunk 8: the padded tail must contribute nothing
    config = make_config(7, rec_coef=-2)
    spikes = make_spikes(7, T=53)
    np.testing.assert_array_equal(
        pallas_counts(config, spikes, time_chunk=8), scan_counts(config, spikes)
    )


def test_lif_count_interpret_saturation():
    # huge weights + dense spikes drive isyn/vmem into the 16-bit clip
    config = make_config(11, w_scale=5000)
    config.threshold[:] = 25_000
    spikes = make_spikes(11, p=0.9, max_count=3)
    got = pallas_counts(config, spikes)
    np.testing.assert_array_equal(got, scan_counts(config, spikes))
    assert got.sum() > 0  # the saturating regime actually fired


def test_lif_count_interpret_time_chunk_invariance():
    config = make_config(5, rec_coef=-2)
    spikes = make_spikes(5, T=64)
    a = pallas_counts(config, spikes, time_chunk=4)
    b = pallas_counts(config, spikes, time_chunk=32)
    np.testing.assert_array_equal(a, b)


def test_lif_count_int8_and_f32_mxu_paths_agree():
    """The int8 MXU projection and the f32 fallback are both exact for
    int8-range weights — identical counts bit for bit."""
    for seed in (13, 14):
        config = make_config(seed, rec_coef=-1, w_scale=127)
        spikes = make_spikes(seed, T=70)
        a = pallas_counts(config, spikes, int8_mm=True)
        b = pallas_counts(config, spikes, int8_mm=False)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, scan_counts(config, spikes))


def test_lif_count_no_sat_clip_elision_exact():
    """When the static bound analysis proves the clips dead, the no_sat
    kernel variant returns identical integers to the clipped one."""
    from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import (
        _no_saturation_possible,
    )

    config = make_config(17, rec_coef=0, w_scale=40)  # small weights, binary spikes
    config.dash_syn[:] = 2  # flagship-like decays keep the static bounds tight
    config.dash_mem[:] = 2
    spikes = (make_spikes(17, T=70, max_count=1) > 0).astype(np.int32)
    assert _no_saturation_possible(config, spike_bound=1, rec_coef=0)

    wr = np.asarray(config.w_rec)
    rec_coef = int(wr.flat[0]) if wr.size else 0
    spikes_tbc = jnp.transpose(jnp.asarray(spikes, jnp.int32), (1, 0, 2))
    args = (
        spikes_tbc,
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
    )
    a = _lif_count_impl(*args, rec_coef=rec_coef, time_chunk=8, interpret=True, no_sat=True)
    b = _lif_count_impl(*args, rec_coef=rec_coef, time_chunk=8, interpret=True, no_sat=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), scan_counts(config, spikes))

    # a saturating config must NOT pass the bound analysis
    hot = make_config(18, w_scale=5000)
    assert not _no_saturation_possible(hot, spike_bound=3, rec_coef=0)


def test_lif_count_bipolar_kernel_matches_combined_raster():
    """The bipolar kernel (kp/kn in, pos = kp & ~kn combined in-kernel, dual
    narrow dots) equals running the standard kernel on the concatenated
    (T, B, 2C) raster — including collisions where both polarities fire."""
    from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import (
        _lif_count_bipolar_impl,
    )

    rng = np.random.default_rng(23)
    C, N, B, T = 6, 20, 3, 70
    config = make_config(23, C=2 * C, N=N, rec_coef=-1, w_scale=30)
    kp = (rng.random((T, B, C)) < 0.2).astype(np.int8)
    kn = (rng.random((T, B, C)) < 0.2).astype(np.int8)  # overlaps collide
    pos = (kp & (1 - kn)).astype(np.int32)
    enc_btc = np.concatenate([pos, kn.astype(np.int32)], axis=-1).transpose(1, 0, 2)

    for int8_mm in (True, False):
        got = _lif_count_bipolar_impl(
            jnp.asarray(kp), jnp.asarray(kn),
            jnp.asarray(config.w_in, jnp.int32),
            jnp.asarray(config.dash_syn, jnp.int32),
            jnp.asarray(config.dash_mem, jnp.int32),
            jnp.asarray(config.threshold, jnp.int32),
            rec_coef=-1, time_chunk=8, interpret=True, int8_mm=int8_mm,
        )
        np.testing.assert_array_equal(np.asarray(got), scan_counts(config, enc_btc))


def stateful_call(config, spikes_btc, state, time_chunk=8):
    wr = np.asarray(config.w_rec)
    rec_coef = int(wr.flat[0]) if wr.size else 0
    int8_mm = bool(np.all(np.abs(np.asarray(config.w_in)) <= 127))
    spikes_tbc = jnp.transpose(jnp.asarray(spikes_btc, jnp.int32), (1, 0, 2))
    out = _lif_count_stateful_impl(
        spikes_tbc,
        jnp.asarray(config.w_in, jnp.int32),
        jnp.asarray(config.dash_syn, jnp.int32),
        jnp.asarray(config.dash_mem, jnp.int32),
        jnp.asarray(config.threshold, jnp.int32),
        jnp.asarray(state[0], jnp.int32),
        jnp.asarray(state[1], jnp.int32),
        jnp.asarray(state[2], jnp.int32),
        rec_coef=rec_coef,
        time_chunk=time_chunk,
        interpret=True,
        int8_mm=int8_mm,
    )
    return np.asarray(out[0]), tuple(np.asarray(s) for s in out[1:])


def test_lif_stateful_interpret_chunked_equals_full():
    """Three carried-state kernel calls == one full-length scan: counts sum
    and the final (isyn, vmem, spk) state are integer-identical."""
    config = make_config(21, rec_coef=-2)
    B, N = 3, config.n_hidden
    spikes = make_spikes(21, T=96)

    state = tuple(np.zeros((B, N), np.int32) for _ in range(3))
    total = np.zeros((B, N), np.int64)
    for part in np.split(spikes, [30, 60], axis=1):  # ragged: 30 + 30 + 36
        counts, state = stateful_call(config, part, state)
        total += counts

    # full-length scan reference with the same carried-state semantics
    w_in = jnp.asarray(config.w_in, jnp.float32)
    inp = jnp.einsum("btc,cn->btn", jnp.asarray(spikes, jnp.float32), w_in).astype(jnp.int32)

    def one(inp_b):
        s0 = tuple(jnp.zeros(N, jnp.int32) for _ in range(3))
        spk, carry, _ = _sim_hidden(
            inp_b,
            jnp.asarray(config.w_rec, jnp.int32),
            jnp.asarray(-2, jnp.int32),
            jnp.asarray(config.dash_syn, jnp.int32),
            jnp.asarray(config.dash_mem, jnp.int32),
            jnp.asarray(config.threshold, jnp.int32),
            s0,
            uniform_rec=True,
            record=False,
        )
        return spk.sum(axis=0), carry[0], carry[1], carry[2]

    counts_ref, isyn_ref, vmem_ref, spk_ref = jax.vmap(one)(inp)
    np.testing.assert_array_equal(total, np.asarray(counts_ref))
    np.testing.assert_array_equal(state[0], np.asarray(isyn_ref))
    np.testing.assert_array_equal(state[1], np.asarray(vmem_ref))
    np.testing.assert_array_equal(state[2], np.asarray(spk_ref))


def test_lif_stateful_bipolar_chunked_equals_combined():
    """Carried-state bipolar kernel calls == the plain stateful kernel on the
    combined (pos, neg) raster, chunk by chunk."""
    from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import (
        _lif_count_bipolar_stateful_impl,
    )

    rng = np.random.default_rng(29)
    C, N, B = 5, 16, 2
    config = make_config(29, C=2 * C, N=N, rec_coef=-2, w_scale=25)
    wr = -2

    state_a = tuple(np.zeros((B, N), np.int32) for _ in range(3))
    state_b = tuple(np.zeros((B, N), np.int32) for _ in range(3))
    tot_a = np.zeros((B, N), np.int64)
    tot_b = np.zeros((B, N), np.int64)
    for part in range(3):
        T = (30, 17, 24)[part]  # ragged chunks
        kp = (rng.random((T, B, C)) < 0.25).astype(np.int8)
        kn = (rng.random((T, B, C)) < 0.25).astype(np.int8)
        out = _lif_count_bipolar_stateful_impl(
            jnp.asarray(kp), jnp.asarray(kn),
            jnp.asarray(config.w_in, jnp.int32),
            jnp.asarray(config.dash_syn, jnp.int32),
            jnp.asarray(config.dash_mem, jnp.int32),
            jnp.asarray(config.threshold, jnp.int32),
            jnp.asarray(state_a[0]), jnp.asarray(state_a[1]), jnp.asarray(state_a[2]),
            rec_coef=wr, time_chunk=8, interpret=True,
        )
        tot_a += np.asarray(out[0])
        state_a = tuple(np.asarray(s) for s in out[1:])

        pos = (kp & (1 - kn)).astype(np.int32)
        enc = np.concatenate([pos, kn.astype(np.int32)], axis=-1)  # (T, B, 2C)
        counts_b, st = stateful_call(
            config, enc.transpose(1, 0, 2), state_b
        )
        tot_b += counts_b
        state_b = st
    np.testing.assert_array_equal(tot_a, tot_b)
    for a, b in zip(state_a, state_b):
        np.testing.assert_array_equal(a, b)


def test_lif_count_rates_rejects_dense_w_rec():
    config = make_config(31)
    config.w_rec = np.arange(config.n_hidden**2, dtype=np.int32).reshape(
        config.n_hidden, config.n_hidden
    )
    with pytest.raises(ValueError, match="uniform w_rec"):
        lif_count_rates(config, make_spikes(31))


# The compiled-path TPU test formerly gated here on RUN_TPU_TESTS could never
# fire (conftest forces the CPU backend); it lives in tests_tpu/ now, which
# runs on the real chip without the CPU forcing.
