"""Attack/release envelope follower (micloc/utils.py:15-81) as a lax.scan.

The reference runs a Python for-loop over every sample (micloc/utils.py:62-74);
here the same per-sample recurrence is a ``lax.scan`` over time, vectorized
over channels, jittable and streamable (the carry is the follower state).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class Envelope:
    def __init__(self, rise_time: float, fall_time: float, fs: float):
        if rise_time > fall_time:
            raise ValueError(
                "for proper functioning, an envelope estimator should have a larger fall time!"
            )
        self.rise_time = rise_time
        self.fall_time = fall_time
        self.fs = fs
        # [fall, rise] window lengths, indexed by the rise/fall flag
        self.win_lens = np.asarray([int(fs * fall_time), int(fs * rise_time)])

    def evolve(self, sig_in, state=None, return_state: bool = False):
        """Envelope of a ``T x C`` signal.

        Matches the reference semantics exactly: output[t] is the state
        *before* absorbing sample t+1, the state update uses
        ``(1 - 1/w) * state + (1/w) * sig * rise`` with w selected per
        channel by the rise/fall comparison (micloc/utils.py:56-79).
        """
        sig_in = jnp.abs(jnp.asarray(sig_in))
        win = jnp.asarray(self.win_lens, dtype=sig_in.dtype)

        s0 = sig_in[0] if state is None else jnp.asarray(state)

        def step(state, sig):
            rise = (sig >= state).astype(sig.dtype)
            w = win[0] * (1 - rise) + win[1] * rise
            new_state = (1 - 1 / w) * state + (1 / w) * sig * rise
            return new_state, state

        s_fin, out = jax.lax.scan(step, s0, sig_in[1:])
        out = jnp.concatenate([out, s_fin[None]], axis=0)
        if return_state:
            return out, s_fin
        return out
