"""Neural (weighted min-sum) LDPC decoder — Dai et al., arXiv:2102.03828.

TPU-native re-design of the reference's
src/neural_ldpc_decoder/NeuralLDPCDecoder.py: an unrolled min-sum decoder with
one learnable per-edge weight (init 0.5) and bias (init 0) per iteration
(reference :35-42), applied as ``relu(|msg| * w_i + b_i)`` re-signed
(:89-91).  No clipping, no quantization, no epsilon passes — the Dai variant
is the minimal neural decoder.  Message routing uses the shared edge-table
ops (ops/bp.py) inside a ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..codes.tanner import TannerGraph
from ..ops import bp, flat
from ..structs import Convention

Params = dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class NeuralDecoderConfig:
    n_iterations: int = 25
    init_weight: float = 0.5
    init_bias: float = 0.0
    convention: Convention = Convention.STANDARD
    # same fast-path selection as BoostedDecoderConfig (see ops/flat.py)
    routing: str = "auto"
    matmul_precision: Optional[str] = None


class NeuralMinSumDecoder:
    def __init__(self, graph: TannerGraph, config: NeuralDecoderConfig = NeuralDecoderConfig()):
        self.graph = graph
        self.config = config
        self.ga = bp.GraphArrays.from_graph(graph)
        if config.routing not in ("auto", "flat", "edge"):
            raise ValueError(f"unknown routing {config.routing!r}")
        if config.routing == "flat" and config.convention == Convention.REFERENCE:
            raise ValueError("flat routing implements the STANDARD convention only")
        self.use_flat = config.routing == "flat" or (
            config.routing == "auto" and config.convention == Convention.STANDARD
        )
        self.fa = flat.FlatGraphArrays.from_graph(graph) if self.use_flat else None

    def init_params(self) -> Params:
        I, E = self.config.n_iterations, self.graph.E
        return {
            "weights_var": jnp.full((I, E), self.config.init_weight, jnp.float32),
            "biases_var": jnp.full((I, E), self.config.init_bias, jnp.float32),
        }

    def apply(self, params: Params, chan_llr: jnp.ndarray) -> jnp.ndarray:
        """chan_llr: [B, N, Z] -> per-iteration APP outputs [I, B, N*Z]
        (reference forward :44-100 returns the same as a list)."""
        if self.use_flat:
            return self._apply_flat(params, chan_llr)
        ga = self.ga
        parity = self.config.convention == Convention.REFERENCE
        B = chan_llr.shape[0]
        chan = jnp.swapaxes(chan_llr.astype(jnp.float32), 1, 2)  # [B, Z, N]
        chan_edge = bp.chan_to_edges(chan, ga)

        msg0 = jnp.zeros((B, ga.Z, ga.E), jnp.float32)
        sums0 = jnp.zeros((B, ga.Z, ga.N), jnp.float32)

        def body(carry, wb):
            msg, vn_sums = carry
            w, b = wb
            v2c = bp.vn_update_extrinsic(chan_edge, msg, vn_sums, ga)  # ref :56-58
            v2c = bp.lift_roll_in(v2c, ga)  # ref :59-63
            c2v_raw = bp.cn_update_minsum(
                v2c, ga, parity_with_reference=parity, zero_handling="exclude"
            )  # ref :66-80
            c2v_raw = bp.lift_roll_out(c2v_raw, ga)  # ref :82-86
            w_mag = jnp.maximum(jnp.abs(c2v_raw) * w[None, None, :] + b[None, None, :], 0.0)
            msg_new = w_mag * jnp.sign(c2v_raw)  # ref :89-91
            sums_new = bp.vn_marginal_sums(msg_new, ga)
            out = chan + sums_new  # ref :94-97 (no clipping)
            return (msg_new, sums_new), out

        (_, _), outs = jax.lax.scan(body, (msg0, sums0), (params["weights_var"], params["biases_var"]))
        return jnp.swapaxes(outs, 2, 3).reshape(self.config.n_iterations, B, ga.N * ga.Z)

    def _apply_flat(self, params: Params, chan_llr: jnp.ndarray) -> jnp.ndarray:
        """TPU fast path on the flat [B, E*Z] layout (ops/flat.py), STANDARD
        convention semantics of the edge path above."""
        fa = self.fa
        prec = self.config.matmul_precision
        B = chan_llr.shape[0]
        chan = chan_llr.astype(jnp.float32).reshape(B, fa.N * fa.Z)

        msg0 = jnp.zeros((B, fa.E * fa.Z), jnp.float32)
        sums0 = jnp.zeros((B, fa.N * fa.Z), jnp.float32)

        def body(carry, wb):
            msg, vn_sums = carry
            w, b = wb
            v2c = flat.route_to_edges(chan + vn_sums, fa, precision=prec) - msg
            c2v = flat.cn_minsum_flat(v2c, fa, precision=prec)
            w_f = fa.edge_weights_to_flat(w)[None]
            b_f = fa.edge_weights_to_flat(b)[None]
            w_mag = jnp.maximum(jnp.abs(c2v) * w_f + b_f, 0.0)
            msg_new = w_mag * jnp.sign(c2v)
            sums_new = flat.route_to_vns(msg_new, fa, precision=prec)
            return (msg_new, sums_new), chan + sums_new

        (_, _), outs = jax.lax.scan(
            body, (msg0, sums0), (params["weights_var"], params["biases_var"])
        )
        return outs  # [I, B, N*Z]

    def __call__(self, params: Params, chan_llr: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, chan_llr)

    def named_parameter_rows(self, params: Params) -> dict:
        """Per-iteration named entries (``weights_var_3`` / ``biases_var_3``,
        mirroring the reference's ParameterList naming) for txt export."""
        import numpy as np

        named = {}
        for pk in ("weights_var", "biases_var"):
            arr = np.asarray(params[pk])
            for i in range(arr.shape[0]):
                named[f"{pk}_{i}"] = arr[i]
        return named

    def decode_hard(self, params: Params, chan_llr: jnp.ndarray) -> jnp.ndarray:
        out = self.apply(params, chan_llr)[-1]
        if self.config.convention == Convention.REFERENCE:
            return (out > 0).astype(jnp.int32)
        return (out < 0).astype(jnp.int32)
