"""BER / FER evaluation.

Replaces src/boosted_neural_ldpc_decoder/Functions.evaluate_ber_fer (:86-102)
with a jit-safe counting kernel.  The hard decision follows the configured
convention (structs.Convention): STANDARD decides bit = (LLR < 0); REFERENCE
convention's consistent decision is bit = (LLR > 0) — the reference's own
evaluator uses (LLR < 0) under its inverted mapping, which reports the
complement BER (verified by execution, SURVEY.md §5); pass
``emulate_reference_decision=True`` to reproduce that quirk in parity tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..structs import Convention


class ErrorCounts(NamedTuple):
    bit_errors: jnp.ndarray  # [I] per-iteration bit error counts
    total_bits: jnp.ndarray  # scalar
    frame_errors: jnp.ndarray  # [I]
    total_frames: jnp.ndarray  # scalar


def hard_decision(
    outputs: jnp.ndarray,
    convention: Convention = Convention.STANDARD,
    emulate_reference_decision: bool = False,
) -> jnp.ndarray:
    if convention == Convention.REFERENCE and not emulate_reference_decision:
        return (outputs > 0).astype(jnp.int32)
    return (outputs < 0).astype(jnp.int32)


def count_errors(
    expected: jnp.ndarray,
    outputs: jnp.ndarray,
    convention: Convention = Convention.STANDARD,
    emulate_reference_decision: bool = False,
) -> ErrorCounts:
    """expected [B, NZ] bits; outputs [I, B, NZ] (or [B, NZ]).  Returns raw
    counts so callers can ``lax.psum`` them across a device mesh before
    normalizing."""
    if outputs.ndim == 2:
        outputs = outputs[None]
    decided = hard_decision(outputs, convention, emulate_reference_decision)
    errs = (decided != expected[None].astype(jnp.int32)).astype(jnp.float32)
    bit_errors = errs.sum(axis=(1, 2))  # [I]
    frame_errors = (errs.sum(axis=2) > 0).astype(jnp.float32).sum(axis=1)  # [I]
    return ErrorCounts(
        bit_errors=bit_errors,
        total_bits=jnp.asarray(expected.size, jnp.float32),
        frame_errors=frame_errors,
        total_frames=jnp.asarray(expected.shape[0], jnp.float32),
    )


def evaluate_ber_fer(
    expected,
    outputs,
    convention: Convention = Convention.STANDARD,
    emulate_reference_decision: bool = False,
):
    """Reference-shaped convenience wrapper (Functions.py:86-102): returns
    ((per-iter bit errors, total bits), (per-iter frame errors, total frames))
    as host Python values."""
    c = count_errors(jnp.asarray(expected), jnp.asarray(outputs), convention,
                     emulate_reference_decision)
    return (
        ([float(v) for v in c.bit_errors], int(c.total_bits)),
        ([float(v) for v in c.frame_errors], int(c.total_frames)),
    )
