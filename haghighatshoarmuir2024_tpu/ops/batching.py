"""Chunked vmap — bounded-memory batched evaluation over a grid axis.

The design-time pipelines materialize (chunk, T, M) intermediates; mapping the
DoA grid in fixed-size chunks (``lax.map`` over ``vmap``) keeps peak HBM use
proportional to the chunk while still batching every kernel.  The reference
instead iterates the grid serially in Python (micloc/beamformer.py:113).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_vmap(fn, xs, chunk: int):
    """Apply ``vmap(fn)`` over the leading axis of ``xs`` in chunks.

    Args:
        fn: function on one element (no leading batch axis); may return a pytree.
        xs: array (or pytree of arrays) with a common leading axis G.
        chunk: chunk size (the last chunk is padded and trimmed).

    Returns:
        pytree of arrays with leading axis G.
    """
    leaves = jax.tree_util.tree_leaves(xs)
    G = leaves[0].shape[0]
    chunk = max(1, min(chunk, G))
    pad = (-G) % chunk

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    xs_p = jax.tree_util.tree_map(_pad, xs)
    xs_r = jax.tree_util.tree_map(
        lambda x: x.reshape((-1, chunk) + x.shape[1:]), xs_p
    )
    out = jax.lax.map(jax.vmap(fn), xs_r)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:])[:G], out
    )
