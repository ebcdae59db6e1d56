"""Fused Pallas TPU kernel: full multi-iteration (weighted/quantized) min-sum
BP decode with messages resident in VMEM.

The XLA paths (ops/flat.py, ops/bp.py) materialize every [B, E*Z] message
tensor in HBM once per iteration, so decode throughput is HBM-bound.  This
kernel keeps the entire message state of a batch tile on-chip for all
iterations: HBM traffic collapses to one read of the channel LLRs and one
write of the final APP per word, everything else lives in VMEM.

Layout (per grid step = one batch tile of ``bt`` words):
  * messages   [E*Z, bt] f32 — flat edge index q = e*Z + z on *sublanes*
    (z = the check copy's lifted index), batch on lanes.  CN-order edge
    enumeration makes every check's messages a contiguous sublane range, and
    Z % 8 == 0 makes each edge's Z-block whole vregs — so the check-node
    reduction is a static reshape [deg*Z, bt] -> [deg, Z, bt] plus
    prefix/suffix min/sign scans over the leading (free) axis, all VPU.
  * routing    Rt [E*Z, N*Z] / R [N*Z, E*Z] one-hot operands (see
    ops/flat.py: the protograph lifting roll is absorbed into them), applied
    on the MXU.  bf16 storage by default — the operands are exactly 0/1, so
    the only rounding is on the message side of the product.
  * weights    [I, E*Z, 1] / [I, N*Z, 1] f32, dynamically indexed by the
    ``fori_loop`` iteration counter.

Supports the full boosted decoder family: SP / MS / QMS check updates,
per-iteration CN edge weights (any sharing mode — they arrive pre-expanded),
UCN (unsatisfied-check) weight splits, VN input weights, QMS
fake-quantization of channel/messages (with exact int8 MXU routing), and LLR
clipping.  Forward-only (Monte-Carlo eval / benchmark); training
differentiates the XLA paths.

Reference semantics being replaced: the [B, Z, E, E] dense tile of
src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:376-429.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codes.tanner import TannerGraph
from ..quantize import _QMS_TABLE

_BIG = 10000.0
_SP_EPS = 1e-7  # atanh clamp (reference BoostedNeuralLDPCDecoder.py:406-408)


def _supported(graph: TannerGraph) -> bool:
    return graph.Z % 8 == 0


@dataclasses.dataclass(frozen=True)
class _Meta:
    """Static kernel metadata (hashable, closed over by the kernel)."""

    M: int
    N: int
    Z: int
    E: int
    row_ptr: tuple[int, ...]
    n_iterations: int
    clip_lo: float
    clip_hi: float
    qms_qbit: Optional[int]
    has_cn_w: bool
    has_vn_w: bool
    int8_routing: bool = False
    has_ucn: bool = False
    sum_product: bool = False  # tanh-domain CN update instead of min-sum
    all_iterations: bool = False  # emit every iteration's APP, not just the last


def _quantize(x, qbit):
    lo, hi, scale = _QMS_TABLE[qbit]
    return jnp.clip(jnp.round(x * scale) / scale, lo, hi)


def _clip_or_quant(x, meta: _Meta):
    if meta.qms_qbit is not None:
        return _quantize(x, meta.qms_qbit)
    return jnp.clip(x, meta.clip_lo, meta.clip_hi)


def _cn_update_segments(v2c, meta: _Meta):
    """Extrinsic min-sum per check via static sublane-range segments.

    v2c: [E*Z, bt] value.  Returns c2v of the same shape.  Per check of
    degree d the two-min is computed with prefix/suffix mins over the d
    Z-blocks; the sign with a total product times own sign.
    """
    Z = meta.Z
    outs = []
    for m in range(meta.M):
        a, b = meta.row_ptr[m], meta.row_ptr[m + 1]
        deg = b - a
        seg = v2c[a * Z : b * Z, :].reshape(deg, Z, v2c.shape[1])
        mag = jnp.abs(seg)
        sgn = jnp.where(seg >= 0, 1.0, -1.0)

        # prefix/suffix mins over the deg axis (static unroll, deg <= ~26)
        pre = [None] * deg
        suf = [None] * deg
        acc = jnp.full_like(mag[0], _BIG)
        for j in range(deg):
            pre[j] = acc
            acc = jnp.minimum(acc, mag[j])
        acc = jnp.full_like(mag[0], _BIG)
        for j in reversed(range(deg)):
            suf[j] = acc
            acc = jnp.minimum(acc, mag[j])

        total_sign = sgn[0]
        for j in range(1, deg):
            total_sign = total_sign * sgn[j]

        rows = []
        for j in range(deg):
            extr_min = jnp.minimum(pre[j], suf[j])
            extr_sgn = total_sign * sgn[j]  # product excluding self (sgn^2=1)
            rows.append(extr_min * extr_sgn)
        outs.append(jnp.stack(rows).reshape(deg * Z, v2c.shape[1]))
    return jnp.concatenate(outs, axis=0)


def _cn_update_segments_sp(v2c, meta: _Meta):
    """Extrinsic sum-product (tanh domain) check update via static segments.

    Same prefix/suffix structure as the min-sum two-min, with products of
    tanh(v/2) instead of mins (reference BoostedNeuralLDPCDecoder.py:400-408;
    ops/flat.cn_sumproduct_flat is the XLA counterpart)."""
    Z = meta.Z
    outs = []
    for m in range(meta.M):
        a, b = meta.row_ptr[m], meta.row_ptr[m + 1]
        deg = b - a
        seg = v2c[a * Z : b * Z, :].reshape(deg, Z, v2c.shape[1])
        t = jnp.tanh(0.5 * seg)

        pre = [None] * deg
        suf = [None] * deg
        acc = jnp.ones_like(t[0])
        for j in range(deg):
            pre[j] = acc
            acc = acc * t[j]
        acc = jnp.ones_like(t[0])
        for j in reversed(range(deg)):
            suf[j] = acc
            acc = acc * t[j]

        rows = []
        for j in range(deg):
            ext = jnp.clip(pre[j] * suf[j], -1.0 + _SP_EPS, 1.0 - _SP_EPS)
            # Mosaic has no atanh lowering; 2*atanh(x) = log((1+x)/(1-x))
            rows.append(jnp.log((1.0 + ext) / (1.0 - ext)))
        outs.append(jnp.stack(rows).reshape(deg * Z, v2c.shape[1]))
    return jnp.concatenate(outs, axis=0)


def _ucn_mask_segments(sign_e, meta: _Meta):
    """Per-edge unsatisfied-check indicator from routed decision signs.

    sign_e: [E*Z, bt], +-1 per edge (the routed hard decision of the edge's
    VN copy).  Per lifted check: product of signs over ALL of its edges
    (self included) — odd parity (-1) marks the check unsatisfied; the
    indicator broadcasts to its edges (reference BoostedNeuralLDPCDecoder.py:
    339-368; ops/flat.check_parity_flat is the XLA counterpart)."""
    Z = meta.Z
    outs = []
    for m in range(meta.M):
        a, b = meta.row_ptr[m], meta.row_ptr[m + 1]
        deg = b - a
        seg = sign_e[a * Z : b * Z, :].reshape(deg, Z, sign_e.shape[1])
        parity = seg[0]
        for j in range(1, deg):
            parity = parity * seg[j]
        ucn = jnp.where(parity < 0, 1.0, 0.0)
        outs.append(
            jnp.broadcast_to(ucn[None], (deg,) + ucn.shape).reshape(
                deg * Z, sign_e.shape[1]
            )
        )
    return jnp.concatenate(outs, axis=0)


def _kernel(meta: _Meta, routing_dtype, chan_ref, rt_ref, r_ref, cnw_ref, vnw_ref,
            ucnw_ref, out_ref, msg_scr, sums_scr):
    """One batch tile, all iterations.

    chan_ref [NZ, bt] f32; rt_ref [EZ, NZ]; r_ref [NZ, EZ]; cnw_ref
    [I, EZ, 1]; vnw_ref [I, NZ, 1]; ucnw_ref [I, EZ, 1]; out_ref [NZ, bt];
    scratch: msg [EZ, bt], sums [NZ, bt].
    """
    chan = chan_ref[:]
    chan_out = _quantize(chan, meta.qms_qbit) if meta.qms_qbit is not None else chan

    msg_scr[:] = jnp.zeros_like(msg_scr)
    sums_scr[:] = jnp.zeros_like(sums_scr)

    if meta.int8_routing:
        # QMS messages live on a 1/scale grid within +-clip_hi, so both
        # matmuls can be exact int8 MXU work (2x bf16 throughput).  The VN
        # total is clipped to +-2*clip_hi first: for |T| beyond that,
        # quantize(T - m) saturates to +-clip_hi for every message m anyway,
        # so the clip is semantics-preserving and keeps the scaled operand in
        # int8 range (max 2 * 15 * scale-normalised = +-30).
        _, q_hi, q_scale = _QMS_TABLE[meta.qms_qbit]
        t_clip = 2.0 * q_hi

    def body(i, _):
        xa = chan * vnw_ref[i] if meta.has_vn_w else chan
        if meta.qms_qbit is not None:
            xa = _quantize(xa, meta.qms_qbit)

        if meta.has_ucn:
            # UCN detection from the previous iteration's APP (iteration 0
            # checks the weighted channel itself, reference :339-374)
            prev_app = jnp.clip(chan_out + sums_scr[:], meta.clip_lo, meta.clip_hi)
            app = jnp.where(i == 0, xa, prev_app)
            dsign = jnp.where(app < 0, -1.0, 1.0)
            if meta.int8_routing:
                s_route = jnp.dot(
                    rt_ref[:], dsign.astype(jnp.int8),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                s_route = jnp.dot(
                    rt_ref[:], dsign.astype(routing_dtype),
                    preferred_element_type=jnp.float32,
                )
            # one-hot rows: routed value is exactly the +-1 decision sign
            ucn_mask = _ucn_mask_segments(jnp.where(s_route < 0, -1.0, 1.0), meta)

        if meta.int8_routing:
            x8 = jnp.round(
                jnp.clip(xa + sums_scr[:], -t_clip, t_clip) * q_scale
            ).astype(jnp.int8)
            routed = jnp.dot(
                rt_ref[:], x8, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (1.0 / q_scale)
        else:
            x = (xa + sums_scr[:]).astype(routing_dtype)
            routed = jnp.dot(rt_ref[:], x, preferred_element_type=jnp.float32)
        v2c = _clip_or_quant(routed - msg_scr[:], meta)

        if meta.sum_product:
            c2v = _cn_update_segments_sp(v2c, meta)
        else:
            c2v = _cn_update_segments(v2c, meta)

        w_mag = jnp.abs(c2v)
        if meta.has_ucn:
            w_mag = w_mag * cnw_ref[i] * (1.0 - ucn_mask) \
                + w_mag * ucnw_ref[i] * ucn_mask
        elif meta.has_cn_w:
            w_mag = w_mag * cnw_ref[i]
        w_mag = jnp.maximum(w_mag, 0.0)
        w_mag = _clip_or_quant(w_mag, meta)
        new_msg = w_mag * jnp.sign(c2v)

        msg_scr[:] = new_msg
        if meta.int8_routing:
            m8 = jnp.round(new_msg * q_scale).astype(jnp.int8)
            sums_scr[:] = jnp.dot(
                r_ref[:], m8, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (1.0 / q_scale)
        else:
            sums_scr[:] = jnp.dot(
                r_ref[:], new_msg.astype(routing_dtype),
                preferred_element_type=jnp.float32,
            )
        if meta.all_iterations:
            out_ref[i] = jnp.clip(chan_out + sums_scr[:], meta.clip_lo, meta.clip_hi)
        return 0

    jax.lax.fori_loop(0, meta.n_iterations, body, 0)
    if not meta.all_iterations:
        out_ref[:] = jnp.clip(chan_out + sums_scr[:], meta.clip_lo, meta.clip_hi)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "bt", "routing_dtype", "interpret"),
)
def _run(chan_nzb, rt, r, cn_w, vn_w, ucn_w, meta: _Meta, bt: int, routing_dtype,
         interpret):
    NZ, B = chan_nzb.shape
    EZ = meta.E * meta.Z
    I = meta.n_iterations
    grid = (B // bt,)
    kernel = functools.partial(_kernel, meta, routing_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NZ, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EZ, NZ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NZ, EZ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, EZ, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, NZ, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, EZ, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((I, NZ, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            if meta.all_iterations
            else pl.BlockSpec((NZ, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (I, NZ, B) if meta.all_iterations else (NZ, B), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((EZ, bt), jnp.float32),
            pltpu.VMEM((NZ, bt), jnp.float32),
        ],
        # the default scoped-vmem limit (16 MB) is conservative; with both
        # routing operands resident plus double-buffered streams the kernel
        # legitimately wants more (v5e has 128 MB of physical VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )(chan_nzb, rt, r, cn_w, vn_w, ucn_w)


class FusedMinsumDecoder:
    """Host-side wrapper: builds routing operands once, handles batch
    padding/transposition, and dispatches the fused kernel.

    Produces the *final-iteration* APP [B, N*Z] — the Monte-Carlo / benchmark
    hot path.  Per-iteration outputs (needed for training losses and the
    per-iteration BER table) come from the XLA paths.
    """

    def __init__(
        self,
        graph: TannerGraph,
        n_iterations: int,
        clip: tuple[float, float] = (-20.0, 20.0),
        qms_qbit: Optional[int] = None,
        cn_weights: Optional[np.ndarray] = None,  # [I, E]
        vn_weights: Optional[np.ndarray] = None,  # [I, N]
        ucn_weights: Optional[np.ndarray] = None,  # [I, E]; enables UCN split
        sum_product: bool = False,  # SP (tanh) check update instead of min-sum
        all_iterations: bool = False,  # return [I, B, N*Z] instead of [B, N*Z]
        bt: Optional[int] = None,  # batch tile (lanes); None = auto by VMEM fit
        routing_dtype=jnp.bfloat16,
        int8_routing: Optional[bool] = None,  # None = auto: on for QMS
        interpret: bool = False,
        engine: str = "stream",  # "stream" (roll-routing grid kernel) | "legacy"
        # also return a per-word syndrome-satisfied flag computed inside the
        # kernel: __call__ -> (app [B, N*Z], ok [B] bool).  Stream engine,
        # final-APP output only (the Monte-Carlo early-exit consumer).
        emit_syndrome: bool = False,
        # ALL-ZERO campaigns: __call__ -> (ok [B], bit_errors [B],
        # frame_error [B]); the APP never leaves the kernel
        emit_stats: bool = False,
        # stats campaigns: sample the AWGN channel INSIDE the kernel — use
        # sample_stats(seed, sigma, batch) instead of __call__ (round 5;
        # ops/pallas/fused_train.py _TrainMeta.sample_channel)
        sample_channel: bool = False,
        # with sample_channel: sample_stats also returns the sampled llr
        # [B, N, Z] (the early-exit engine re-decodes escalations from it)
        emit_chan: bool = False,
        # with sample_channel: decode words at caller-given original batch
        # indices via stats_sampled_at(seed, sigma, widx), re-sampling their
        # channel in kernel (value = the phase-1 sampler's bt; 0 = off)
        sample_at_idx: int = 0,
        # forwarded to the stream kernel: "vmem" | "hbm" | "auto" message
        # residency (ops/pallas/fused_train.py)
        store_space: str = "auto",
        # forwarded: Mosaic scoped-VMEM budget (MB); None = auto.  The full
        # Z=384 BG1 APP decode needs 126 (fixed 123.94 MB stack requirement)
        vmem_limit_mb=None,
    ):
        if qms_qbit is not None and qms_qbit not in _QMS_TABLE:
            raise ValueError(f"unsupported qms_qbit {qms_qbit}")
        if emit_syndrome and all_iterations:
            raise ValueError("emit_syndrome needs the final-APP-only decode")
        if emit_syndrome and engine != "stream":
            raise ValueError("emit_syndrome is a stream-engine epilogue")
        if emit_stats and (all_iterations or engine != "stream"):
            raise ValueError("emit_stats is a stream-engine, final-only mode")
        if sample_channel and not emit_stats:
            raise ValueError("sample_channel is a stats-only campaign mode")
        self.graph = graph
        self.emit_syndrome = emit_syndrome
        self.emit_stats = emit_stats

        # The default decode path is the streaming kernel
        # (ops/pallas/fused_train.py): iteration = a grid dimension (so
        # all-iterations output streams to HBM at the full batch tile — round 1
        # paid a 4x tile shrink to hold [I, NZ, bt] in VMEM), arbitrary Z via
        # sublane padding, and roll-based routing (measured +17-29% over the
        # legacy one-hot-matmul kernel, benchmarks/measure_r2.json).  The
        # round-1 fori_loop kernel remains as engine="legacy" for comparison.
        self._delegate = None
        if engine not in ("stream", "legacy"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine == "stream" or not _supported(graph) or all_iterations:
            if engine == "legacy":
                import warnings

                warnings.warn(
                    "engine='legacy' requires Z % 8 == 0 and final-only output; "
                    f"this config (Z={graph.Z}, all_iterations={all_iterations}) "
                    "delegates to the stream kernel instead",
                    stacklevel=2,
                )
            from .fused_train import FusedTrainDecoder

            if int8_routing is None:
                int8_routing = qms_qbit is not None and not interpret
            self._delegate = FusedTrainDecoder(
                graph,
                n_iterations=n_iterations,
                clip=clip,
                qms_qbit=qms_qbit,
                has_cn_w=cn_weights is not None,
                has_vn_w=vn_weights is not None,
                has_ucn=ucn_weights is not None,
                sum_product=sum_product,
                store_msgs=False,
                stream_outputs=all_iterations,
                bt=bt,
                routing_dtype=routing_dtype,
                int8_routing=int8_routing,
                interpret=interpret,
                emit_syndrome=emit_syndrome,
                emit_stats=emit_stats,
                sample_channel=sample_channel,
                emit_chan=emit_chan,
                sample_at_idx=sample_at_idx,
                store_space=store_space,
                vmem_limit_mb=vmem_limit_mb,
            )
            self.meta = self._delegate.meta
            self.bt = self._delegate.bt
            self._w = tuple(
                None if w is None else np.asarray(w, np.float32)
                for w in (cn_weights, ucn_weights, vn_weights)
            )
            self._all_iterations = all_iterations
            self._jitted = None
            return
        self._all_iterations = all_iterations
        if bt is None:
            # measured on v5e (both codes): throughput rises to bt=512 and
            # flattens; the raised vmem_limit_bytes in _run makes 512 fit.
            # UCN adds a routed-sign live tensor per iteration, and
            # all-iterations outputs an [I, NZ, bt] block — both need smaller
            # tiles to stay inside scoped VMEM on large codes.
            if all_iterations or (ucn_weights is not None and graph.E * graph.Z > 2500):
                bt = 128
            else:
                bt = 512
        self.bt = bt
        self.routing_dtype = routing_dtype
        self.interpret = interpret
        if int8_routing is None:
            int8_routing = qms_qbit is not None
        if int8_routing and qms_qbit is None:
            raise ValueError("int8 routing needs QMS quantization (grid messages)")
        if ucn_weights is not None and cn_weights is None:
            raise ValueError("UCN weighting requires CN weights (reference :433-503)")
        if sum_product and qms_qbit is not None:
            raise ValueError("SP and QMS are mutually exclusive decoder types")
        self.meta = _Meta(
            M=graph.M, N=graph.N, Z=graph.Z, E=graph.E,
            row_ptr=tuple(int(x) for x in graph.row_ptr),
            n_iterations=n_iterations,
            clip_lo=float(clip[0]), clip_hi=float(clip[1]),
            qms_qbit=qms_qbit,
            has_cn_w=cn_weights is not None,
            has_vn_w=vn_weights is not None,
            int8_routing=int8_routing,
            has_ucn=ucn_weights is not None,
            sum_product=sum_product,
            all_iterations=all_iterations,
        )

        from ..flat import FlatGraphArrays

        # host numpy (not device arrays): the outer jit in __call__ closes
        # over these, and device-resident constants are fetched back over the
        # (slow, when remote) tunnel at every lowering
        operand_dtype = jnp.int8 if int8_routing else routing_dtype
        R = np.asarray(FlatGraphArrays.from_graph(graph, cn_reduce="gather").R)
        self._r = R.astype(operand_dtype)
        self._rt = np.ascontiguousarray(R.T).astype(operand_dtype)

        I, EZ, NZ = n_iterations, graph.E * graph.Z, graph.N * graph.Z
        if cn_weights is not None:
            cw = np.repeat(np.asarray(cn_weights, np.float32), graph.Z, axis=1)
            self._cn_w = cw.reshape(I, EZ, 1)
        else:
            self._cn_w = np.ones((I, EZ, 1), np.float32)
        if vn_weights is not None:
            vw = np.repeat(np.asarray(vn_weights, np.float32), graph.Z, axis=1)
            self._vn_w = vw.reshape(I, NZ, 1)
        else:
            self._vn_w = np.ones((I, NZ, 1), np.float32)
        if ucn_weights is not None:
            uw = np.repeat(np.asarray(ucn_weights, np.float32), graph.Z, axis=1)
            self._ucn_w = uw.reshape(I, EZ, 1)
        else:
            self._ucn_w = np.ones((I, EZ, 1), np.float32)
        self._jitted = None

    @staticmethod
    def from_decoder(decoder, params, **kw) -> "FusedMinsumDecoder":
        """Build from a BoostedNeuralDecoder + trained params (SP/MS/QMS,
        incl. UCN weighting — the full boosted decoder family)."""
        from ...structs import DecoderType, SharingMode

        from ...structs import Convention

        cfg = decoder.config
        if cfg.convention == Convention.REFERENCE:
            raise ValueError(
                "fused kernel implements STANDARD-convention semantics only; "
                "REFERENCE-parity decoding uses the edge path (ops/bp.py)"
            )
        cn_w, ucn_w, vn_w = decoder._expanded_weights(params)
        if cfg.sharing.ucn == SharingMode.NONE:
            ucn_w = None
        return FusedMinsumDecoder(
            decoder.graph,
            n_iterations=cfg.n_iterations,
            clip=(cfg.allowed_llr_range.start, cfg.allowed_llr_range.end),
            qms_qbit=cfg.qms_qbit if cfg.decoder_type == DecoderType.QMS else None,
            cn_weights=None if cn_w is None else np.asarray(cn_w),
            vn_weights=None if vn_w is None else np.asarray(vn_w),
            ucn_weights=None if ucn_w is None else np.asarray(ucn_w),
            sum_product=cfg.decoder_type == DecoderType.SP,
            **kw,
        )

    def __call__(self, chan_llr: jnp.ndarray) -> jnp.ndarray:
        """chan_llr [B, N, Z] (or [B, N*Z]) -> final APP [B, N*Z].

        The whole body (pad/transpose/kernel/untranspose) is jitted, so the
        layout shuffles fuse with the kernel dispatch; callers don't need an
        outer jit (retraces only on a new batch size)."""
        if self._jitted is None:
            self._jitted = jax.jit(
                self._call_impl if self._delegate is None else self._delegate_impl
            )
        return self._jitted(chan_llr)

    def sample_stats(self, seed, sigma, batch: int, raw_chan: bool = False):
        """Stats-only decode with in-kernel channel sampling: (ok [B],
        bit_errors [B], frame_error [B]) — plus the sampled llr when
        constructed with emit_chan=True ([B, N, Z], or the raw packed
        [NZp, Bp] buffer with raw_chan=True — see ``stats_packed``).
        ``seed`` int32 scalar (vary per batch), ``sigma`` f32 noise std.
        Call under jit."""
        if self._delegate is None or not self._delegate.meta.sample_channel:
            raise ValueError("construct with sample_channel=True")
        cn_w, ucn_w, vn_w = self._w
        return self._delegate.apply_sampled(cn_w, ucn_w, vn_w, seed, sigma,
                                            batch, raw_chan=raw_chan)

    def stats_sampled_at(self, seed, sigma, widx):
        """Stats-only decode of the words at original batch indices ``widx``
        [K] int32, RE-SAMPLING their channel in kernel from the same
        (seed, index) counter stream as the phase-1 sampler (construct with
        sample_channel=True, sample_at_idx=<phase-1 bt>).  Call under jit."""
        if self._delegate is None or not self._delegate.meta.sample_at_idx:
            raise ValueError("construct with sample_at_idx=<phase-1 bt>")
        cn_w, ucn_w, vn_w = self._w
        return self._delegate.apply_sampled_at(cn_w, ucn_w, vn_w, seed, sigma,
                                               widx)

    def stats_packed(self, chan_packed):
        """Stats-only decode from a raw packed [NZp, B'] channel buffer (the
        ``sample_stats(raw_chan=True)`` layout): the early-exit engine
        column-gathers escalations and re-decodes them without any
        full-batch transpose.  Call under jit."""
        if self._delegate is None:
            raise ValueError("stats_packed requires the fused-train delegate")
        cn_w, ucn_w, vn_w = self._w
        return self._delegate.apply_packed(cn_w, ucn_w, vn_w, chan_packed)

    def _delegate_impl(self, chan_llr: jnp.ndarray) -> jnp.ndarray:
        cn_w, ucn_w, vn_w = self._w
        res = self._delegate.apply(cn_w, ucn_w, vn_w, chan_llr)
        if self.emit_stats:
            return res  # (ok, bit_errors, frame_error)
        if self.emit_syndrome:
            outs, ok = res
            return outs[-1], ok
        return res if self._all_iterations else res[-1]

    def _call_impl(self, chan_llr: jnp.ndarray) -> jnp.ndarray:
        g = self.graph
        B = chan_llr.shape[0]
        x = chan_llr.reshape(B, g.N * g.Z).astype(jnp.float32)
        pad = (-B) % self.bt
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        out = _run(
            x.T, self._rt, self._r, self._cn_w, self._vn_w, self._ucn_w,
            self.meta, self.bt, self.routing_dtype, self.interpret,
        )
        if self.meta.all_iterations:
            return jnp.swapaxes(out, 1, 2)[:, :B, :]  # [I, B, N*Z]
        return out.T[:B]
