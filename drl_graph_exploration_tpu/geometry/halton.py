"""Batched Halton quasi-random sequence.

The reference vendors Burkardt's scalar Halton library and wraps it in
``QRNG`` for RRT node sampling (``/root/reference/include/em_exploration/RNG.h:15-42``,
``/root/reference/src/halton/halton.cpp``).  Here the radical-inverse is
computed for a whole block of indices at once with a fixed digit budget, so it
jits and vmaps; 32 base-``b`` digits cover indices far beyond any planner run.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# host-side constant: device placement happens at trace time
_PRIMES = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37], dtype=np.int32)

_NUM_DIGITS = 32


def radical_inverse(index: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of integer ``index`` in ``base`` (broadcasting)."""
    index = jnp.asarray(index, jnp.int32)
    base = jnp.asarray(base, jnp.int32)
    r = jnp.zeros(jnp.broadcast_shapes(index.shape, base.shape), jnp.float32)
    scale = jnp.ones_like(r)
    i = index
    for _ in range(_NUM_DIGITS):
        scale = scale / base.astype(jnp.float32)
        digit = (i % base).astype(jnp.float32)
        r = r + digit * scale
        i = i // base
    return r


def halton(start: jnp.ndarray, count: int, dim: int) -> jnp.ndarray:
    """``count`` consecutive Halton points of dimension ``dim`` starting at
    integer index ``start`` (exclusive of 0 by convention: pass start >= 1).

    Returns (count, dim) in [0, 1).
    """
    idx = start + jnp.arange(count, dtype=jnp.int32)
    bases = _PRIMES[:dim]
    return radical_inverse(idx[:, None], bases[None, :])
