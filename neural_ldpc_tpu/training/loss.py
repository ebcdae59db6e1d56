"""Multi-iteration weighted decoder loss.

Parity with src/boosted_neural_ldpc_decoder/LDPCDecoderLoss.py: per-iteration
losses weighted by eta^coeff, accumulated and normalized by the weight sum
(:73-107).  Three loss types (:82-100):

* BCE: sigmoid cross-entropy of the APP "logits" against the bit labels.
* SoftBEROnAllZero: mean sigmoid of the APP (expected bit-1 probability).
* FEROnAllZero: 0.5 * (1 - sign_through(min over bits)) per frame.

Convention handling: the reference's APP is a logit for bit=1 (inverted BPSK);
under STANDARD convention the logit for bit=1 is -output, so BCE/SoftBER/FER
negate accordingly.  Pure function of (outputs, labels) — jit/grad safe.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp

from ..ops.ste import sign_through
from ..structs import Convention, LossType


def _bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid cross-entropy (mean over all elements),
    identical to torch.nn.functional.binary_cross_entropy_with_logits."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def multi_iteration_loss(
    outputs: jnp.ndarray,
    expected: jnp.ndarray,
    loss_type: LossType = LossType.BCE,
    etha: float = 1.0,
    coeff: Union[int, Sequence[int], None] = 1,
    convention: Convention = Convention.STANDARD,
) -> jnp.ndarray:
    """outputs: [I, B, NZ] (or [B, NZ] for a single iteration);
    expected: [B, NZ] bit labels (or [I, B, NZ] per-iteration labels).

    coeff: per-iteration exponent(s) for the eta weighting (the train driver
    passes list(range(I)), reference train/…:284-288); scalar broadcasts.
    """
    if outputs.ndim == 2:
        outputs = outputs[None]
    n_iters = outputs.shape[0]
    if expected.ndim == 2:
        expected = jnp.broadcast_to(expected[None], outputs.shape)
    expected = expected.astype(outputs.dtype)

    if coeff is None:
        coeffs = [1] * n_iters
    elif isinstance(coeff, int):
        coeffs = [coeff] * n_iters
    else:
        coeffs = list(coeff)
        if len(coeffs) != n_iters:
            raise ValueError(f"coeff length {len(coeffs)} != iterations {n_iters}")

    flip = convention == Convention.STANDARD  # logits for bit=1 are -output

    total = 0.0
    weight_sum = 0.0
    # reference iterates high->low (order only matters for fp rounding, :73-74)
    for i in range(n_iters - 1, -1, -1):
        w = etha ** coeffs[i]
        out_i = outputs[i]
        logits = -out_i if flip else out_i
        if loss_type == LossType.BCE:
            term = _bce_with_logits(logits, expected[i])
        elif loss_type == LossType.SoftBEROnAllZero:
            term = jnp.mean(1.0 / (1.0 + jnp.exp(-logits)))  # P(bit=1)
        elif loss_type == LossType.FEROnAllZero:
            # frame errs: any bit decided 1 <=> min over bits of -logits < 0
            term = jnp.mean(0.5 * (1.0 - sign_through(jnp.min(-logits, axis=1))))
        else:
            raise ValueError(f"unknown loss type {loss_type}")
        total = total + w * term
        weight_sum = weight_sum + w

    return total / weight_sum if weight_sum > 0 else total
