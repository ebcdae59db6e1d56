"""PRNG helpers for host-side loops."""

import jax


def split_async(key):
    """``jax.random.split`` without the hidden device sync.

    ``key, sub = jax.random.split(key)`` tuple-unpacks by *iterating* the
    [2, ...] key array, which materializes it on the host — a full round-trip
    per call (~20 ms over a tunneled TPU), serializing every dispatch loop
    that draws keys.  Indexing keeps both halves as lazy device values.
    """
    ks = jax.random.split(key)
    return ks[0], ks[1]
