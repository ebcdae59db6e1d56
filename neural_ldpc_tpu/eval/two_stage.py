"""Two-stage decoding: base decoder + post decoder on base failures only.

This is the operational mode the Kwak error-floor machinery exists for
(arXiv:2310.07194): the post decoder never sees the general word
distribution — it is invoked ONLY for words whose base decode fails the
syndrome check, so its aggressive failure-distribution training cannot hurt
easy words.  System FER = P(base fails AND post fails).

Escalation uses the true syndrome (per-word parity of the hard decisions
against the lifted H), so it works on real data, not just known codewords:
a decode whose output satisfies every check is accepted from stage 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.tanner import TannerGraph
from ..ops import flat


def make_syndrome_ok(graph: TannerGraph):
    """Jitted [B, N*Z] APP -> [B] bool: True when every lifted check is
    satisfied by the hard decisions (STANDARD convention, LLR < 0 -> bit 1).
    Shared by TwoStageDecoder and the Monte-Carlo early-exit engine."""
    fa = flat.FlatGraphArrays.from_graph(graph, cn_reduce="gather")

    def ok(app: jnp.ndarray) -> jnp.ndarray:
        sign = jnp.where(app < 0, -1.0, 1.0)
        sign_e = flat.route_to_edges(sign, fa)
        sign_e = jnp.where(sign_e < 0, -1.0, 1.0)
        parity = flat._padded_check_view(sign_e, fa, 1.0).prod(axis=2)  # [B,M,Z]
        return (parity > 0).all(axis=(1, 2))

    return jax.jit(ok)


class TwoStageDecoder:
    """Wraps two decode callables (APP [B, N*Z] each) with syndrome routing.

    ``base_decode`` / ``post_decode``: chan_llr [B, N, Z] -> final APP
    [B, N*Z] (e.g. FusedMinsumDecoder instances or jitted decoder.apply[-1]).
    Both run on the full batch (SIMD-friendly: at FER ~1e-5 the second pass
    doubles compute only when measuring deep floors — for production serving
    with sparse failures, gather the failed rows host-side instead).
    """

    def __init__(self, graph: TannerGraph, base_decode, post_decode):
        # decode callables must produce STANDARD-convention APPs (LLR < 0 ->
        # bit 1); REFERENCE-convention outputs would invert the syndrome
        # decisions silently, so the fused/flat paths' STANDARD-only guards
        # also protect this class
        self.graph = graph
        self.base_decode = base_decode
        self.post_decode = post_decode
        self._fa = flat.FlatGraphArrays.from_graph(graph, cn_reduce="gather")
        self._syndrome_ok = jax.jit(self._syndrome_ok_impl)

    def _syndrome_ok_impl(self, app: jnp.ndarray) -> jnp.ndarray:
        """[B, N*Z] APP -> [B] bool, True when every lifted check is satisfied
        by the hard decisions (LLR < 0 -> bit 1)."""
        sign = jnp.where(app < 0, -1.0, 1.0)
        sign_e = flat.route_to_edges(sign, self._fa)
        sign_e = jnp.where(sign_e < 0, -1.0, 1.0)
        parity = flat._padded_check_view(sign_e, self._fa, 1.0).prod(axis=2)  # [B,M,Z]
        return (parity > 0).all(axis=(1, 2))

    def __call__(self, chan_llr: jnp.ndarray):
        """Returns (app [B, N*Z], used_post [B] bool)."""
        app1 = self.base_decode(chan_llr)
        ok1 = self._syndrome_ok(app1)
        app2 = self.post_decode(chan_llr)
        app = jnp.where(ok1[:, None], app1, app2)
        return app, ~ok1

    def decode_sparse(self, chan_llr: jnp.ndarray, min_post_batch: int = 256):
        """Serving-shaped two-stage decode: the post decoder runs ONLY on the
        escalated rows (round-1 ran it on the full batch — 2x decode cost per
        word even at FER 1e-7).

        The failed rows are gathered on device, padded up to a power-of-two
        bucket (bounds retrace count and keeps the kernel's batch tiling
        happy), decoded, and scattered back.  Cost per word approaches pure
        base decode as the failure rate vanishes.  Returns
        (app [B, N*Z], used_post [B] bool)."""
        app1 = self.base_decode(chan_llr)
        fail = np.asarray(~self._syndrome_ok(app1))
        idx = np.nonzero(fail)[0]
        if idx.size == 0:
            return app1, jnp.asarray(fail)
        bucket = max(min_post_batch, 1 << (int(idx.size) - 1).bit_length())
        pad_idx = np.zeros(bucket, np.int32)
        pad_idx[: idx.size] = idx
        sel = jnp.take(chan_llr, jnp.asarray(pad_idx), axis=0)
        app2 = self.post_decode(sel)[: idx.size]
        app = app1.at[jnp.asarray(idx)].set(app2)
        return app, jnp.asarray(fail)

    def decode_with_fallback_stats(self, chan_llr, expected_bits: Optional[jnp.ndarray] = None):
        """Decode and count stage statistics (host values).

        expected_bits [B, N*Z] (0/1) or None for all-zero."""
        app1 = self.base_decode(chan_llr)
        ok1 = self._syndrome_ok(app1)
        app2 = self.post_decode(chan_llr)
        app = jnp.where(ok1[:, None], app1, app2)
        bits = (app < 0).astype(jnp.int32)
        exp = (jnp.zeros_like(bits) if expected_bits is None
               else expected_bits.astype(jnp.int32))
        frame_err = (bits != exp).any(axis=1)
        base_bits = (app1 < 0).astype(jnp.int32)
        base_err = (base_bits != exp).any(axis=1)
        return {
            "frames": int(chan_llr.shape[0]),
            "escalated": int(jnp.sum(~ok1)),
            "base_frame_errors": int(jnp.sum(base_err)),
            "system_frame_errors": int(jnp.sum(frame_err)),
        }
