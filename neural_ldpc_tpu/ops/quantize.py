"""Fake-quantization with straight-through estimators (STE), jit-safe.

Parity targets: reference src/boosted_neural_ldpc_decoder/Functions.py:29-83
(``qms_clipping_torch`` / ``cal_msa_q_torch`` / ``Cal_MSA_Q``) and the inline
copy in BoostedNeuralLDPCDecoder._quantize_message (:187-214).

Forward value is the quantized message; the gradient is that of the clipped
identity (``stop_gradient`` carries the quantization residual).  ``jnp.round``
rounds half-to-even, matching torch/numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# q_bit -> (clip_lo, clip_hi, scale); quantized value = clip(round(x * scale) / scale).
# The q_bit=-5 entry is the reference's "5-bit, integer step" mode.
_QMS_TABLE = {
    6: (-15.5, 15.5, 1.0),
    5: (-7.5, 7.5, 2.0),
    -5: (-15.0, 15.0, 1.0),
    4: (-7.0, 7.0, 1.0),
    3: (-6.0, 6.0, 0.5),
}


def qms_clip(x: jnp.ndarray, q_bit: int) -> jnp.ndarray:
    """Clip to the q_bit range without quantizing (reference Functions.py:29-40)."""
    if q_bit not in _QMS_TABLE:
        return x
    lo, hi, _ = _QMS_TABLE[q_bit]
    return jnp.clip(x, lo, hi)


def qms_quantize_value(x: jnp.ndarray, q_bit: int) -> jnp.ndarray:
    """Pure quantized value, no STE (reference Functions.Cal_MSA_Q, :70-83).
    Works on numpy or jax arrays (used host-side by the channel generator)."""
    if q_bit not in _QMS_TABLE:
        return x
    lo, hi, scale = _QMS_TABLE[q_bit]
    xp = jnp if isinstance(x, jnp.ndarray) else __import__("numpy")
    return xp.clip(xp.round(x * scale) / scale, lo, hi)


def qms_quantize_ste(x: jnp.ndarray, q_bit: int) -> jnp.ndarray:
    """Straight-through fake-quant: forward = quantized, backward = clipped
    identity (reference Functions.cal_msa_q_torch, :43-67)."""
    if q_bit not in _QMS_TABLE:
        return x
    lo, hi, scale = _QMS_TABLE[q_bit]
    q = jnp.clip(jnp.round(x * scale) / scale, lo, hi)
    clipped = jnp.clip(x, lo, hi)
    return clipped + jax.lax.stop_gradient(q - clipped)
