"""Boosted neural LDPC decoder (Kwak et al., arXiv:2310.07194) — TPU-native.

Functional re-design of the reference's
src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py (538 lines of
stateful nn.Module with dense E x E routing):

* the per-iteration loop is a ``lax.scan`` over stacked per-iteration weights
  (the reference mutates ``self.llr`` / ``self.outputs`` instance lists,
  :94-101,:512,:523 — here message state is an explicit scan carry);
* SP / MS / QMS variants (reference :400-423), node weight-sharing modes 0-5
  per node type (:108-151,:216-236), UCN detection with separate UCN weights
  (:339-374,:431-503), STE quantization (:187-214), LLR clipping (:386-393,
  :507-521) are all supported;
* batch size and iteration targeting are not baked into the module — any
  batch works, and ``target_iter`` only selects outputs (the decoder always
  runs iterations 0..I-1; the reference's skip-iteration call pattern relies
  on stale cross-call state and is intentionally not reproduced, SURVEY §3.2).

Set ``convention=Convention.REFERENCE`` for bit-exact parity with the torch
reference (epsilon hacks + its CN sign factor); the default STANDARD
convention is the textbook-consistent fix documented in SURVEY.md §5.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..codes.tanner import TannerGraph
from ..ops import bp, flat
from ..ops.quantize import qms_quantize_ste
from ..structs import Clipping, Convention, DecoderType, NodeWeightSharingConfig, SharingMode
from .sharing import build_sharing_specs

Params = dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class BoostedDecoderConfig:
    """Static decoder configuration (reference constructor kwargs, :15-49)."""

    n_iterations: int = 20
    decoder_type: DecoderType = DecoderType.QMS
    qms_qbit: int = 5
    sharing: NodeWeightSharingConfig = NodeWeightSharingConfig(
        cn=SharingMode.ITER, ucn=SharingMode.NONE, vn=SharingMode.NONE
    )
    fixed_iterative_nodes: tuple[int, ...] = ()
    fixed_iterative_nodes_init_weight: int = 0
    allowed_weight_range: Clipping = Clipping(start=0.0, end=2.0)
    allowed_bias_range: Clipping = Clipping(start=0.0, end=2.0)
    allowed_llr_range: Clipping = Clipping(start=-20.0, end=20.0)
    init_cn_weight: float = 1.0
    init_ucn_weight: float = 1.0
    init_vn_weight: float = 1.0
    convention: Convention = Convention.STANDARD
    # TPU fast path: "flat" = one-hot MXU routing on a flat [B, E*Z] message
    # layout (ops/flat.py, 1.7x-5.4x faster on TPU v5e than "edge" gathers);
    # "edge" = the gather formulation in ops/bp.py (required for REFERENCE-
    # convention parity, which needs the reference's epsilon hacks).  "auto"
    # picks flat for STANDARD convention and edge for REFERENCE.
    routing: str = "auto"
    cn_reduce: str = "auto"  # flat-path check reduction: slot_matmul | gather
    # jax matmul precision for the one-hot routing ("highest" for exact-f32
    # differential tests; None = backend default, bf16-pass MXU on TPU).
    matmul_precision: Optional[str] = None


class BoostedNeuralDecoder:
    """Holds static config + graph tables; all state lives in the params pytree."""

    def __init__(self, graph: TannerGraph, config: BoostedDecoderConfig = BoostedDecoderConfig()):
        self.graph = graph
        self.config = config
        self.ga = bp.GraphArrays.from_graph(graph)
        self.specs = build_sharing_specs(
            graph, config.sharing, config.n_iterations, config.fixed_iterative_nodes
        )
        if config.sharing.ucn != SharingMode.NONE and config.sharing.cn == SharingMode.NONE:
            raise ValueError("UCN weighting requires CN weighting (reference forward :433-503)")
        if config.routing not in ("auto", "flat", "edge"):
            raise ValueError(f"unknown routing {config.routing!r}")
        if config.routing == "flat" and config.convention == Convention.REFERENCE:
            raise ValueError(
                "flat routing implements the STANDARD convention only; "
                "REFERENCE-parity needs routing='edge'"
            )
        # flat routing's one-hot operand is [N*Z, E*Z] f32; past ~64 MB the
        # embedded constant dominates compile (and can exceed remote-compile
        # request limits) — auto falls back to the O(E) gather tables then
        flat_operand_bytes = graph.N * graph.Z * graph.E * graph.Z * 4
        self.use_flat = config.routing == "flat" or (
            config.routing == "auto"
            and config.convention == Convention.STANDARD
            and flat_operand_bytes <= 64 * 1024 * 1024
        )
        # built eagerly: constructing device constants lazily inside a jit
        # trace would cache tracers on self (UnexpectedTracerError)
        self.fa = (
            flat.FlatGraphArrays.from_graph(graph, config.cn_reduce)
            if self.use_flat else None
        )

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------
    def init_params(self) -> Params:
        init = {
            "cn": self.config.init_cn_weight,
            "ucn": self.config.init_ucn_weight,
            "vn": self.config.init_vn_weight,
        }
        params = {}
        for key, spec in self.specs.items():
            w = spec.init(init[key])
            if w is not None:
                params[f"weight_{key}"] = w
        return params

    def clamp_params(self, params: Params) -> Params:
        """Projection step after each optimizer update (reference
        _apply_constraints, :153-179, called at train/…:294)."""
        r = self.config.allowed_weight_range
        return {k: jnp.clip(v, r.start, r.end) for k, v in params.items()}

    def trainable_row_masks(self) -> dict[str, jnp.ndarray]:
        """Per-leaf row masks (1 = trainable) implementing
        ``fixed_iterative_nodes_init_weight`` freezing."""
        masks = {}
        for key, spec in self.specs.items():
            m = spec.trainable_row_mask(self.config.fixed_iterative_nodes_init_weight)
            if m is not None:
                masks[f"weight_{key}"] = jnp.asarray(m)[:, None]
        return masks

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------
    def _expanded_weights(
        self,
        params: Params,
        fixed_iter_weights: Optional[dict[str, dict[int, jnp.ndarray]]] = None,
    ):
        ov = fixed_iter_weights or {}
        cn = self.specs["cn"].expand_to_edges(
            params.get("weight_cn"), self.ga.cn_of_edge, ov.get("cn")
        )
        ucn = self.specs["ucn"].expand_to_edges(
            params.get("weight_ucn"), self.ga.cn_of_edge, ov.get("ucn")
        )
        vn = self.specs["vn"].expand_to_nodes(params.get("weight_vn"), ov.get("vn"))
        return cn, ucn, vn

    def apply(
        self,
        params: Params,
        chan_llr: jnp.ndarray,
        fixed_iter_weights: Optional[dict[str, dict[int, jnp.ndarray]]] = None,
    ) -> jnp.ndarray:
        """Run all iterations.  chan_llr: [B, N, Z] (flat bit n*Z+z order, as
        produced by the channel).  Returns per-iteration APP outputs
        [I, B, N*Z] (reference forward returns the same as a list, :533-538).
        """
        if self.use_flat:
            return self._apply_flat(params, chan_llr, fixed_iter_weights)
        cfg = self.config
        ga = self.ga
        parity = cfg.convention == Convention.REFERENCE
        is_qms = cfg.decoder_type == DecoderType.QMS
        llr_lo, llr_hi = cfg.allowed_llr_range.start, cfg.allowed_llr_range.end

        B = chan_llr.shape[0]
        chan = jnp.swapaxes(chan_llr.astype(jnp.float32), 1, 2)  # [B, Z, N]
        chan_out = qms_quantize_ste(chan, cfg.qms_qbit) if is_qms else chan  # ref :517-518

        cn_w, ucn_w, vn_w = self._expanded_weights(params, fixed_iter_weights)
        use_ucn = cfg.sharing.ucn != SharingMode.NONE

        xs = {
            "i": jnp.arange(cfg.n_iterations),
            "cn_w": cn_w if cn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
            "ucn_w": ucn_w if ucn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
            "vn_w": vn_w if vn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
        }

        msg0 = jnp.zeros((B, ga.Z, ga.E), jnp.float32)
        sums0 = jnp.zeros((B, ga.Z, ga.N), jnp.float32)
        app0 = jnp.zeros((B, ga.Z, ga.N), jnp.float32)

        def body(carry, x):
            msg, vn_sums, prev_app, xa_state = carry
            i = x["i"]

            # --- VN input weighting + quantization (reference :325-337).
            # Parity quirk: the reference reassigns ``xa_input`` inside its
            # iteration loop (:318 vs :329,:337), so VN weights (and QMS
            # re-quantization) compound across iterations.  STANDARD mode
            # applies the weight to the pristine channel every iteration.
            if parity:
                xa_w = xa_state * x["vn_w"][None, None, :] if vn_w is not None else xa_state
            elif vn_w is not None:
                xa_w = chan * x["vn_w"][None, None, :]
            else:
                xa_w = chan
            xa_q = qms_quantize_ste(xa_w, cfg.qms_qbit) if is_qms else xa_w

            # --- UCN detection from previous APP (reference :339-374)
            if use_ucn:
                app = jnp.where(i == 0, xa_q, prev_app)
                ucn_mask = bp.check_parity_indicator(app, ga, parity_with_reference=parity)
                scn_mask = 1.0 - ucn_mask

            # --- VN update + lifting (reference :376-384)
            chan_edge = bp.chan_to_edges(xa_q, ga)
            v2c = bp.vn_update_extrinsic(chan_edge, msg, vn_sums, ga)
            v2c = bp.lift_roll_in(v2c, ga)

            # --- pre-CN clip / quantize (reference :386-389)
            if is_qms:
                v2c = qms_quantize_ste(v2c, cfg.qms_qbit)
            else:
                v2c = jnp.clip(v2c, llr_lo, llr_hi)

            # --- CN update (reference :391-423) and unlift (:425-429)
            if cfg.decoder_type == DecoderType.SP:
                c2v_raw = bp.cn_update_sumproduct(v2c, ga, parity_with_reference=parity)
            else:
                # parity mode reproduces the reference's +1e-4 zero-avoidance
                # pass and its removal after the min (:391-393,:416)
                c2v_raw = bp.cn_update_minsum(
                    v2c, ga, parity_with_reference=parity,
                    zero_handling="eps" if parity else "standard",
                )
            c2v_raw = bp.lift_roll_out(c2v_raw, ga)

            # --- CN/UCN weighting on magnitudes (reference :431-503)
            mag = jnp.abs(c2v_raw)
            if cn_w is None:
                w_mag = mag
            elif use_ucn:
                w_mag = mag * x["cn_w"][None, None, :] * scn_mask \
                    + mag * x["ucn_w"][None, None, :] * ucn_mask
            else:
                w_mag = mag * x["cn_w"][None, None, :]

            # --- ReLU + post clip/quantize, re-sign (reference :505-512)
            w_mag = jnp.maximum(w_mag, 0.0)
            if is_qms:
                w_mag = qms_quantize_ste(w_mag, cfg.qms_qbit)
            else:
                w_mag = jnp.clip(w_mag, llr_lo, llr_hi)
            msg_new = w_mag * jnp.sign(c2v_raw)

            # --- marginal / APP output (reference :513-526)
            sums_new = bp.vn_marginal_sums(msg_new, ga)
            out = jnp.clip(chan_out + sums_new, llr_lo, llr_hi)  # [B, Z, N]

            return (msg_new, sums_new, out, xa_q if parity else xa_state), out

        _, outs = jax.lax.scan(body, (msg0, sums0, app0, chan), xs)
        # [I, B, Z, N] -> [I, B, N, Z] -> [I, B, N*Z] (flat bit order n*Z+z)
        return jnp.swapaxes(outs, 2, 3).reshape(cfg.n_iterations, B, ga.N * ga.Z)

    def _apply_flat(
        self,
        params: Params,
        chan_llr: jnp.ndarray,
        fixed_iter_weights: Optional[dict[str, dict[int, jnp.ndarray]]] = None,
    ) -> jnp.ndarray:
        """TPU fast path: same semantics as the edge path under the STANDARD
        convention, on the flat [B, E*Z] layout with MXU routing (ops/flat.py).
        """
        cfg = self.config
        fa = self.fa
        prec = cfg.matmul_precision
        is_qms = cfg.decoder_type == DecoderType.QMS
        llr_lo, llr_hi = cfg.allowed_llr_range.start, cfg.allowed_llr_range.end

        B = chan_llr.shape[0]
        chan = chan_llr.astype(jnp.float32).reshape(B, fa.N * fa.Z)  # [B, NZ]
        chan_out = qms_quantize_ste(chan, cfg.qms_qbit) if is_qms else chan

        cn_w, ucn_w, vn_w = self._expanded_weights(params, fixed_iter_weights)
        use_ucn = cfg.sharing.ucn != SharingMode.NONE

        xs = {
            "i": jnp.arange(cfg.n_iterations),
            "cn_w": cn_w if cn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
            "ucn_w": ucn_w if ucn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
            "vn_w": vn_w if vn_w is not None else jnp.zeros((cfg.n_iterations, 0)),
        }

        msg0 = jnp.zeros((B, fa.E * fa.Z), jnp.float32)
        sums0 = jnp.zeros((B, fa.N * fa.Z), jnp.float32)
        app0 = jnp.zeros((B, fa.N * fa.Z), jnp.float32)

        def body(carry, x):
            msg, vn_sums, prev_app = carry
            i = x["i"]

            # VN input weighting + quantization (reference :325-337)
            xa_w = chan * fa.vn_weights_to_flat(x["vn_w"])[None] if vn_w is not None else chan
            xa_q = qms_quantize_ste(xa_w, cfg.qms_qbit) if is_qms else xa_w

            # UCN detection from previous APP (reference :339-374)
            if use_ucn:
                app = jnp.where(i == 0, xa_q, prev_app)
                ucn_mask = flat.check_parity_flat(app, fa, precision=prec)
                scn_mask = 1.0 - ucn_mask

            # VN update, routing + lift in one matmul (reference :376-384)
            v2c = flat.route_to_edges(xa_q + vn_sums, fa, precision=prec) - msg

            # pre-CN clip / quantize (reference :386-389)
            if is_qms:
                v2c = qms_quantize_ste(v2c, cfg.qms_qbit)
            else:
                v2c = jnp.clip(v2c, llr_lo, llr_hi)

            # CN update (reference :391-423)
            if cfg.decoder_type == DecoderType.SP:
                c2v = flat.cn_sumproduct_flat(v2c, fa, precision=prec)
            else:
                c2v = flat.cn_minsum_flat(v2c, fa, precision=prec)

            # CN/UCN weighting on magnitudes (reference :431-503)
            mag = jnp.abs(c2v)
            if cn_w is None:
                w_mag = mag
            elif use_ucn:
                cw = fa.edge_weights_to_flat(x["cn_w"])[None]
                uw = fa.edge_weights_to_flat(x["ucn_w"])[None]
                w_mag = mag * cw * scn_mask + mag * uw * ucn_mask
            else:
                w_mag = mag * fa.edge_weights_to_flat(x["cn_w"])[None]

            # ReLU + post clip/quantize, re-sign (reference :505-512)
            w_mag = jnp.maximum(w_mag, 0.0)
            if is_qms:
                w_mag = qms_quantize_ste(w_mag, cfg.qms_qbit)
            else:
                w_mag = jnp.clip(w_mag, llr_lo, llr_hi)
            msg_new = w_mag * jnp.sign(c2v)

            # marginal / APP output (reference :513-526)
            sums_new = flat.route_to_vns(msg_new, fa, precision=prec)
            out = jnp.clip(chan_out + sums_new, llr_lo, llr_hi)
            return (msg_new, sums_new, out), out

        _, outs = jax.lax.scan(body, (msg0, sums0, app0), xs)
        return outs  # [I, B, N*Z], already in flat bit order n*Z+z

    def __call__(
        self,
        params: Params,
        chan_llr: jnp.ndarray,
        target_iter: Union[int, Sequence[int], None] = None,
        fixed_iter_weights: Optional[dict[str, dict[int, jnp.ndarray]]] = None,
    ):
        """Reference-compatible entry point (forward :260-538): returns the
        selected iteration output(s); ``None`` returns all iterations
        [I, B, N*Z]."""
        outputs = self.apply(params, chan_llr, fixed_iter_weights)
        if target_iter is None:
            return outputs
        if isinstance(target_iter, int):
            return outputs[target_iter]
        return outputs[jnp.asarray(tuple(target_iter))]

    def named_parameter_rows(self, params: Params) -> dict:
        """Explode stacked params into reference-named per-iteration entries
        (``weight_CN_3`` etc., reference _param_name :105-106) for the
        hardware .txt export path."""
        import numpy as np

        named = {}
        for key, spec in self.specs.items():
            pk = f"weight_{key}"
            if pk not in params:
                continue
            arr = np.asarray(params[pk])
            row_iters = spec.temporal_rows if spec.temporal_rows else range(spec.n_iterations)
            for r, it in enumerate(row_iters):
                named[f"weight_{key.upper()}_{it}"] = arr[r]
        return named

    def decode_hard(self, params: Params, chan_llr: jnp.ndarray) -> jnp.ndarray:
        """Final-iteration hard decisions [B, N*Z] (0/1) under the configured
        convention (see structs.Convention for the reference's decision quirk)."""
        out = self.apply(params, chan_llr)[-1]
        if self.config.convention == Convention.REFERENCE:
            return (out > 0).astype(jnp.int32)  # positive LLR favours bit 1
        return (out < 0).astype(jnp.int32)
