"""Fused Pallas training tier: multi-iteration BP decode with a hand-written
backward kernel (custom VJP), so the *training* step rides VMEM-resident
messages instead of streaming every per-iteration tensor through HBM.

Closes the round-1 gap where training ran 60-500x slower than fused decode
(`ops/pallas/minsum.py` is forward-only): the reference's training hot loop
(train/train_BoostedNeuralLDPCDecoder.py:260-296 — forward all iterations,
BCE over the per-iteration outputs, backward, Adam) maps here to

  forward   one grid step per (batch-tile, iteration): the BP iteration runs
            entirely in VMEM; only the iteration's APP output (needed by the
            loss anyway) and the entering message state (the checkpoint the
            backward pass restarts from) stream to HBM.
  backward  the reverse grid: each step re-derives the iteration's
            intermediates in VMEM from the stored entering state (one extra
            routing matmul) and propagates the adjoint message/sum carries,
            accumulating per-iteration weight gradients and the channel
            gradient.

Gradient semantics replicate the XLA flat path (ops/flat.py) *exactly*,
including JAX's tie conventions (verified empirically on this image):
clip/max gradients split 0.5 at boundaries, min-reductions split evenly
among ties, the two-min extrinsic uses first-occurrence argmin, |x| has
gradient +1 at 0, and sign() carries no gradient.  The pre-clip APP leaves
the kernel unclipped so the final clip (and the channel-side STE quantizer)
are differentiated by JAX outside the kernel.

Kernel generality over ops/pallas/minsum.py (round-1 VERDICT items 4/8):
  * arbitrary Z — each edge's Z-block is padded to a multiple of 8 sublanes
    (the reference handles arbitrary Z by building (EZ)x(EZ) circulant
    matmuls, src/boosted_neural_ldpc_decoder/ConnectingMatrix.py:84-99);
  * checks are re-ordered by degree so the check-node reduction unrolls per
    degree CLASS, not per check — code size is sum(distinct degrees), which
    keeps compile time flat for BG1-scale codes;
  * per-iteration outputs stream to HBM (iteration = a grid dimension), so
    all-iterations decoding keeps the full batch tile.

Supports MS and QMS (with the exact int8 MXU routing trick) plus UCN weight
splits and VN input weights; SP training rides a tanh-domain
backward (round 4).
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
from ..quantize import _QMS_TABLE, qms_quantize_ste

_BIG = 10000.0


# ---------------------------------------------------------------------------
# Degree-sorted, Z-padded graph layout
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class _TrainMeta:
    """Static kernel metadata (hashable, closed over by the kernels)."""

    M: int
    N: int
    Z: int
    Zp: int  # Z padded to a multiple of 8 (sublane granularity)
    E: int
    NZ: int
    NZp: int  # N*Zp (per-VN Zp-padded row count)
    Ep8: int  # E rounded up to a sublane multiple (weight-stream rows)
    Np8: int  # N rounded up to a sublane multiple
    deg_classes: tuple[tuple[int, int], ...]  # (degree, n_checks), sorted order
    n_iterations: int
    clip_lo: float
    clip_hi: float
    qms_qbit: Optional[int]
    has_cn_w: bool
    has_vn_w: bool
    has_ucn: bool
    int8_routing: bool
    store_msgs: bool
    sum_product: bool = False  # tanh-domain CN update (fwd + custom bwd)
    # VN<->edge routing strategy: "matmul" = one-hot MXU operands (memory
    # O(N*E*Z^2) — the round-1 design); "roll" = per-edge sublane rotates +
    # accumulates on the VPU (no operand, exact f32, memory O(E*Z)).  The
    # permuted-edge-order topology tables ride the meta so the kernel can
    # close over them statically.
    routing: str = "matmul"
    # weight-stream layout: "col" = [I, EZp, 1] blocks (fast broadcast
    # multiply; every row lane-pads to 128 lanes, fine for small codes);
    # "lane" = [I, Ep8, bt] per-edge values replicated across lanes (tiny
    # windows, the BG1-scale capacity fix; slightly slower expansion)
    w_layout: str = "col"
    # matmul mode, non-grid messages: route f32 values exactly as three bf16
    # MXU passes (_dot_split3) instead of one lossy bf16 cast — the bf16
    # rounding otherwise cascades through min-sum iterations (round-2
    # bigcode artifact: agree=0.785 vs exact at BG1 scale / 20 iterations)
    exact_matmul: bool = False
    vn_of_edge: tuple[int, ...] = ()  # [E] in permuted edge order
    shift_of_edge: tuple[int, ...] = ()  # [E] in permuted edge order
    # False = decode-only fast path: just the final iteration's APP leaves the
    # kernel (training and per-iteration stats need the full stream)
    stream_outputs: bool = True
    # Big-code mode (round 4, VERDICT item 1): the [E*Zp, bt] message state no
    # longer fits VMEM residency, so it lives in HBM and streams through small
    # VMEM bounce buffers one degree-class CHUNK at a time (async DMA).  In
    # training mode the carry IS the per-iteration store the backward pass
    # needs anyway (read slot i-1, write slot i), so streaming costs no extra
    # HBM traffic on the forward; the backward adds an HBM gradient-carry
    # buffer.  Chunking also bounds Mosaic register liveness to one chunk —
    # the round-3 wall was ~100 MB of spills from per-class temporaries the
    # allocator never freed.  Roll routing only.
    hbm_store: bool = False
    # (msg_row_base, degree, n_checks) per chunk; chunks subdivide degree
    # classes at whole-check granularity and cover the E*Zp rows in order
    chunks: tuple[tuple[int, int, int], ...] = ()
    chunk_rows: int = 0  # max rows over chunks (bounce-buffer height)
    # decode-only epilogue: emit a per-word syndrome-satisfied flag computed
    # from the final APP inside the kernel (one extra routed pass) — the
    # Monte-Carlo early-exit engine otherwise pays a [B, E*Z] XLA
    # materialization per batch just to route the decision signs
    emit_syndrome: bool = False
    # decode-only, ALL-ZERO-codeword campaigns: the kernel's only output is
    # the per-word stats row [8, B] (row 0 = syndrome ok, 1 = bit errors,
    # 2 = frame error) — the [NZp, B] APP never leaves VMEM, saving the
    # dominant HBM write+read per Monte-Carlo batch
    emit_stats: bool = False
    # Round 5: sample the AWGN channel INSIDE the kernel (stats campaigns,
    # all-zero words): the hardware PRNG (pltpu.prng_random_bits + one
    # xorshift-multiply mixing round) feeds Box-Muller, llr = 2(1+sigma*n)/
    # sigma^2 lands straight in a VMEM scratch, and the whole XLA threefry
    # sample + [NZp, B] HBM write+read disappears.  Different random stream
    # than jax.random (statistically equivalent; campaigns are Monte-Carlo).
    # VMEM-resident decode path only.
    sample_channel: bool = False
    # with sample_channel: also write the sampled llr [NZp, B] to HBM (the
    # early-exit engine re-decodes escalated words from it); without it the
    # llr never leaves the kernel
    emit_chan: bool = False
    # with sample_channel: instead of sampling the tile's own words, take a
    # per-word ORIGINAL-batch-index input and reproduce the counter-hash
    # stream of a phase-1 sampler whose batch tile width was this value
    # (power of two; 0 = off).  The early-exit engine re-decodes compacted
    # escalations this way — no llr export, no full-batch transpose/gather
    # ever touches HBM.
    sample_at_idx: int = 0
    # Mosaic scoped-VMEM budget (MB).  121 is the calibrated sweet spot
    # (the compiler schedules TO the limit then overshoots a few MB;
    # physical v5e VMEM is 128).  The full Z=384 BG1 decode's fixed stack
    # requirement is 123.94 MB — 126 admits it with ~2 MB of physical
    # headroom (decode-only; callers opt in via vmem_limit_mb).
    vmem_limit_mb: int = 121


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _vmem_bytes(meta: "_TrainMeta", bt: int, operand_bytes: int) -> int:
    """Rough peak VMEM estimate for the kernels at batch tile ``bt``.

    Counts the scratches, the double-buffered stream blocks, the weight
    streams ([Ep8, bt] replicated-lane windows — the round-2 [EZp, 1] layout
    lane-padded every message row to 128 lanes and was the BG1-scale
    capacity wall), and the routing operands; the backward pass is the peak
    when training."""
    EZpB, NZpB = meta.E * meta.Zp * 4, meta.NZp * 4
    lanes = max(bt, 128)
    if meta.w_layout == "col":
        we, wn = meta.E * meta.Zp * 512, meta.NZp * 512  # [X, 1] lane-pads
    else:
        we, wn = meta.Ep8 * lanes * 4 * 2, meta.Np8 * lanes * 4 * 2
    w = 0
    if meta.has_cn_w or meta.has_ucn:
        w += 2 * we  # in-window + grad-out window (double-buffered)
    if meta.has_ucn:
        w += 2 * we
    if meta.has_vn_w:
        w += 2 * wn
    fwd = (EZpB + NZpB) * bt + 4 * NZpB * bt + 2 * NZpB * bt
    if meta.store_msgs:
        fwd += 2 * EZpB * bt
        bwd = (EZpB + NZpB) * bt + 2 * EZpB * bt + 8 * NZpB * bt + 2 * NZpB * bt + w
        fwd = max(fwd, bwd)
    return fwd + w + operand_bytes


def _vmem_bytes_hbm(meta: "_TrainMeta", bt: int) -> int:
    """Peak VMEM estimate for the HBM-streamed kernels at batch tile ``bt``:
    per-VN [NZp, bt] windows/scratches plus chunk bounce buffers and their
    in-flight temporaries (the message state itself lives in HBM).

    bt is the LANE axis, and sub-128-lane VMEM blocks pad to 128 lanes —
    so every byte term is clamped at 128 lanes (a bt=32 window physically
    costs the same as bt=128; round-5 fix of the round-4 under-estimate
    that "unlocked" Z=384 at bt=32 on paper only)."""
    lanes = max(bt, 128)
    NZpB = meta.NZp * 4 * lanes
    CRB = meta.chunk_rows * 4 * lanes
    w = 0
    if meta.has_cn_w or meta.has_ucn:
        w += 2 * meta.Ep8 * lanes * 4 * 2
    if meta.has_ucn:
        w += 2 * meta.Ep8 * lanes * 4 * 2
    if meta.has_vn_w:
        w += 2 * meta.Np8 * lanes * 4 * 2
    if meta.store_msgs:
        # backward peak: chan(2) + gout(2) + gchan + gsums + g_T + sums_prev
        # = 8 windows, + chanq(2)/gchanq under QMS, + prevout(2) under UCN;
        # 3 bounces + ~8x chunk-sized register liveness in the per-chunk
        # adjoint
        n = 8 + (3 if meta.qms_qbit is not None else 0) + (2 if meta.has_ucn else 0)
        return n * NZpB + 11 * CRB + w
    # decode windows (_fwd_run_hbm): chan in (double-buffered) + sums scratch
    # = 3; APP / per-iteration output adds 2 more (emit_stats's [8, bt] row
    # is negligible); QMS adds the quantized-channel pair.  2 chunk bounce
    # scratches + in-flight DMA/liveness ≈ 6x chunk.
    n = 3
    if meta.stream_outputs or not meta.emit_stats:
        n += 2
    if meta.qms_qbit is not None:
        n += 2
    return n * NZpB + 6 * CRB + w


def fused_capacity_ok(graph: TannerGraph, qms: bool = False) -> bool:
    """Whether the fused kernel can decode this code on one chip.

    Round 4: codes whose message state exceeds VMEM residency stream it
    through HBM per degree-class chunk (meta.hbm_store), so the remaining
    limits are the per-VN working set (NZp windows must fit VMEM at the
    minimum 128-lane tile) and compile time (the roll routing unrolls per
    edge; beyond ~1024 edges the build is impractical).  Round 5: the HBM
    bound mirrors the constructor's lane-honest decode estimate at the
    bt=128 floor (sub-128 tiles lane-pad to 128, so descending below 128
    buys no VMEM); QMS decode carries two extra per-VN windows."""
    Zp = _round8(graph.Z)
    EZp = graph.E * Zp
    NZp = graph.N * Zp
    # VMEM-resident fast path, roll routing, bt=128
    if (EZp + NZp) * 4 * 128 + 6 * NZp * 4 * 128 <= 90 * 1024 * 1024:
        return True
    # HBM-streamed APP decode at the bt=128 floor: n per-VN windows + chunk
    # bounces + ~2 MB weight-stream/liveness slack (matches _vmem_bytes_hbm
    # with store_msgs=False, emit_stats=False — the stats-only campaign mode
    # needs 2 windows fewer, so this gate is conservative for campaigns)
    maxdeg = int(np.diff(graph.row_ptr).max())
    chunk_rows = max((2 * 1024 * 1024) // (4 * 128), maxdeg * Zp)
    n = 7 if qms else 5
    est = (n * NZp + 6 * chunk_rows) * 4 * 128 + 2 * 1024 * 1024
    return graph.E <= 1024 and est <= 100 * 1024 * 1024


def build_layout(graph: TannerGraph, need_routing_operand: bool = True):
    """Degree-sorted check order + per-edge Z padding.

    Returns (edge_perm [E] new->old, deg_classes, R [N*Zp, E*Zp]).  The
    one-hot routing operand absorbs the lifting roll exactly like
    ops/flat.py's R, on the permuted/padded edge axis.  BOTH sides use the
    per-node Zp-padded sublane layout (VN bit (n, z) lives at row n*Zp + z),
    so the roll-routing mode can rotate whole aligned tiles; pad rows/columns
    are all-zero and sliced off outside the kernel.
    """
    degs = np.diff(graph.row_ptr)
    if degs.min() < 2:
        raise ValueError("degree-1 checks unsupported (extrinsic min undefined)")
    order = np.argsort(degs, kind="stable")
    edge_perm = np.concatenate(
        [np.arange(graph.row_ptr[m], graph.row_ptr[m + 1]) for m in order]
    ).astype(np.int32)
    deg_classes = []
    for d in degs[order]:
        if deg_classes and deg_classes[-1][0] == d:
            deg_classes[-1][1] += 1
        else:
            deg_classes.append([int(d), 1])
    deg_classes = tuple((d, n) for d, n in deg_classes)

    Z, Zp = graph.Z, _round8(graph.Z)
    E = graph.E
    if not need_routing_operand:
        # roll routing uses only edge_perm/deg_classes; the dense one-hot R
        # is [N*Zp, E*Zp] (12.7 GB host RAM at the full BG1 Z=384 lift)
        return edge_perm, deg_classes, None
    R = np.zeros((graph.N * Zp, E * Zp), np.float32)
    zc = np.arange(Z)
    for k, e in enumerate(edge_perm):
        zv = (zc + graph.shift_of_edge[e]) % Z
        R[graph.vn_of_edge[e] * Zp + zv, k * Zp + zc] = 1.0
    return edge_perm, deg_classes, R


def _class_ranges(meta: _TrainMeta):
    """Yield (row_base, degree, n_checks) per degree class (rows = msg rows)."""
    base = 0
    for d, n in meta.deg_classes:
        yield base, d, n
        base += d * n * meta.Zp


def _build_chunks(deg_classes, Zp: int, max_rows: int):
    """Split degree classes into whole-check chunks of <= max_rows message
    rows (or one check, whichever is larger).  Chunks cover the E*Zp rows
    contiguously in class order, so per-chunk iteration visits edges in
    exactly the order the whole-array formulations do."""
    chunks = []
    base = 0
    for d, n in deg_classes:
        per = max(1, max_rows // (d * Zp))
        c0 = 0
        while c0 < n:
            nc = min(per, n - c0)
            chunks.append((base + c0 * d * Zp, d, nc))
            c0 += nc
        base += d * n * Zp
    return tuple(chunks)


# ---------------------------------------------------------------------------
# In-kernel math helpers
# ---------------------------------------------------------------------------
def _quantize(x, qbit):
    lo, hi, scale = _QMS_TABLE[qbit]
    return jnp.clip(jnp.round(x * scale) / scale, lo, hi)


def _clip_or_quant(x, meta: _TrainMeta):
    if meta.qms_qbit is not None:
        return _quantize(x, meta.qms_qbit)
    return jnp.clip(x, meta.clip_lo, meta.clip_hi)


def _msg_range(meta: _TrainMeta):
    if meta.qms_qbit is not None:
        lo, hi, _ = _QMS_TABLE[meta.qms_qbit]
        return lo, hi
    return meta.clip_lo, meta.clip_hi


def _clip_grad_mask(x, lo, hi):
    """Gradient of jnp.clip (= min(max(x, lo), hi)) with JAX's balanced-tie
    convention: 1 inside, 0.5 at either boundary, 0 outside."""
    gmax = jnp.where(x > lo, 1.0, jnp.where(x == lo, 0.5, 0.0))
    y = jnp.maximum(x, lo)
    gmin = jnp.where(y < hi, 1.0, jnp.where(y == hi, 0.5, 0.0))
    return gmax * gmin


def _relu_grad_mask(x):
    """Gradient of jnp.maximum(x, 0): 1 above, 0.5 at 0, 0 below."""
    return jnp.where(x > 0, 1.0, jnp.where(x == 0, 0.5, 0.0))


def _roll_z(seg, shift, meta: _TrainMeta):
    """Rotate the valid Z rows of a [Zp, bt] tile by ``shift`` (pad rows stay)."""
    shift = shift % meta.Z
    if shift == 0:
        return seg
    if meta.Z == meta.Zp:
        return jnp.roll(seg, -shift, axis=0)
    body = jnp.concatenate([seg[shift : meta.Z], seg[:shift]], axis=0)
    return jnp.concatenate([body, seg[meta.Z :]], axis=0)


def _split3_bf16(x):
    """Exact 3-term bf16 decomposition of f32: hi + mid + lo == x bitwise.

    bf16 keeps 8 mantissa bits per term; three terms cover f32's 24.  Each
    residual subtraction is exact in f32 (the rounded term agrees with x in
    its leading bits), so routing x through a 0/1 one-hot operand as three
    bf16 matmuls with f32 accumulation reproduces the f32 gather exactly —
    the MXU-friendly alternative to precision=HIGHEST, which hangs this
    toolchain's Mosaic compile helper (measured 2026-08-17)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_split3(op, x):
    """One-hot operand @ f32 x, exactly, via three bf16 MXU passes."""
    if hasattr(op, "at"):  # a ref: load once
        op = op[:]
    acc = None
    for part in _split3_bf16(x):
        term = jnp.dot(op, part, preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _edge_w_class(w_ref, e0, ne, Zp, bt):
    """Per-edge weights [e0, e0+ne) from the replicated-lane stream, expanded
    to the class's [ne*Zp, bt] message rows.

    Weight streams are stored [I, Ep8, bt] with the per-edge value REPLICATED
    across the bt lanes (edges in permuted class order).  The round-2
    [I, EZp, 1] layout lane-padded every row to 128 lanes — a 23 MB window
    per stream at BG1 scale, double-buffered: THE kernel capacity wall
    (measured 2026-08-17); a lane-major [1, EZp] layout merely moves the same
    bytes into transposed-column registers.  Replicating the E per-edge
    values across lanes keeps the window at Ep8 x bt (~200 KB) and the
    expansion to message rows is a cheap sublane broadcast over Zp."""
    w = w_ref[0, e0 : e0 + ne, :]  # [ne, bt]
    bt_w = w.shape[1]
    w = jnp.broadcast_to(w[:, None, :], (ne, Zp, bt_w))
    return w.reshape(ne * Zp, bt_w)


def _vn_w_flat(w_ref, meta: "_TrainMeta"):
    """Per-VN weights [1, Np8, bt] -> flat [NZp, bt] (rows n*Zp + z)."""
    Np8, bt = w_ref.shape[1], w_ref.shape[2]
    w = jnp.broadcast_to(w_ref[0][:, None, :], (Np8, meta.Zp, bt))
    return w.reshape(Np8 * meta.Zp, bt)[: meta.NZp]


def _w_rows(w_ref, meta: "_TrainMeta", base, nrows, bt):
    """Per-edge weights for message rows [base, base+nrows), broadcastable
    against [nrows, bt], in whichever stream layout rides the meta."""
    if meta.w_layout == "col":
        return w_ref[0, base : base + nrows]  # [nrows, 1]
    ne, e0 = nrows // meta.Zp, base // meta.Zp
    return _edge_w_class(w_ref, e0, ne, meta.Zp, bt)  # [nrows, bt]


def _w_vn(w_ref, meta: "_TrainMeta"):
    """Per-VN-copy weights broadcastable against [NZp, bt]."""
    if meta.w_layout == "col":
        return w_ref[0]  # [NZp, 1]
    return _vn_w_flat(w_ref, meta)


def _g_edge_w(g_w, meta: "_TrainMeta", ne):
    """Weight-gradient reduction matching the stream layout: column sums for
    "col" ([nrows, 1]); per-edge lane-partials for "lane" ([ne, bt] — the
    pack broadcast's autodiff reduces the lanes)."""
    if meta.w_layout == "col":
        return jnp.sum(g_w, axis=1, keepdims=True)
    return g_w.reshape(ne, meta.Zp, g_w.shape[1]).sum(axis=1)


def _route_e_rows(x, rt_ref, meta: _TrainMeta, routing_dtype, e_lo, e_hi,
                  grad=False):
    """VN-side [NZp, bt] -> edge rows [e_lo, e_hi) of the routed view
    ([ne*Zp, bt], lift roll absorbed).

    The row-range form lets the backward kernel stream one degree class at a
    time instead of materializing the full [E*Zp, bt] routed tensor; ``grad``
    marks cotangent inputs, which are not grid-valued, so the int8 matmul
    trick is bypassed for them."""
    if meta.routing == "roll":
        Zp = meta.Zp
        rows = []
        for e in range(e_lo, e_hi):
            n = meta.vn_of_edge[e]
            rows.append(_roll_z(x[n * Zp : (n + 1) * Zp], meta.shift_of_edge[e], meta))
        return jnp.concatenate(rows, axis=0)
    rt = rt_ref[e_lo * meta.Zp : e_hi * meta.Zp, :]
    if meta.int8_routing and not grad:
        _, q_hi, q_scale = _QMS_TABLE[meta.qms_qbit]
        t_clip = 2.0 * q_hi
        x8 = jnp.round(jnp.clip(x, -t_clip, t_clip) * q_scale).astype(jnp.int8)
        return jnp.dot(rt, x8, preferred_element_type=jnp.int32).astype(
            jnp.float32
        ) * (1.0 / q_scale)
    if meta.exact_matmul:
        return _dot_split3(rt, x)
    return jnp.dot(rt, x.astype(routing_dtype), preferred_element_type=jnp.float32)


def _route_e_from_n(x, rt_ref, meta: _TrainMeta, routing_dtype, grad=False):
    """VN-side [NZp, bt] -> full edge-side [E*Zp, bt]."""
    return _route_e_rows(x, rt_ref, meta, routing_dtype, 0, meta.E, grad=grad)


def _route_n_from_e(msg, r_ref, meta: _TrainMeta, routing_dtype, quantized=False):
    """Edge-side [E*Zp, bt] -> per-VN sums [NZp, bt] (scatter-accumulate).

    ``quantized`` marks grid-valued messages so the matmul branch can use the
    exact int8 trick; the roll branch is exact f32 either way."""
    if meta.routing == "roll":
        Zp = meta.Zp
        acc = [None] * meta.N
        for e in range(meta.E):
            n = meta.vn_of_edge[e]
            c = _roll_z(msg[e * Zp : (e + 1) * Zp], -meta.shift_of_edge[e], meta)
            acc[n] = c if acc[n] is None else acc[n] + c
        zero = jnp.zeros((Zp, msg.shape[1]), jnp.float32)
        parts = [a if a is not None else zero for a in acc]
        if meta.NZp > meta.N * Zp:
            parts.append(jnp.zeros((meta.NZp - meta.N * Zp, msg.shape[1]), jnp.float32))
        return jnp.concatenate(parts, axis=0)
    if meta.int8_routing and quantized:
        _, _, q_scale = _QMS_TABLE[meta.qms_qbit]
        m8 = jnp.round(msg * q_scale).astype(jnp.int8)
        return jnp.dot(r_ref[:], m8, preferred_element_type=jnp.int32).astype(
            jnp.float32
        ) * (1.0 / q_scale)
    if meta.exact_matmul:
        return _dot_split3(r_ref, msg)
    return jnp.dot(r_ref[:], msg.astype(routing_dtype), preferred_element_type=jnp.float32)


def _cn_minsum_classes(v2c, meta: _TrainMeta, post=None):
    """Forward extrinsic min-sum per degree class: [rows, bt] -> [rows, bt].

    ``post(c2v_part, base, nrows)`` post-processes each class's c2v while it
    is live (weighting/quantize/re-sign), so the whole per-class chain fuses
    into one vreg pass and only the finished message rows are concatenated —
    a flat second weighting pass would keep mag + expanded weights + parts
    co-resident and spill at BG1 scale (measured +75 MB, 2026-08-17)."""
    bt = v2c.shape[1]
    outs = []
    for base, d, n in _class_ranges(meta):
        seg = v2c[base : base + d * n * meta.Zp, :].reshape(n, d, meta.Zp, bt)
        mag = jnp.abs(seg)
        sgn = jnp.where(seg >= 0, 1.0, -1.0)

        pre = [None] * d
        suf = [None] * d
        acc = jnp.full_like(mag[:, 0], _BIG)
        for j in range(d):
            pre[j] = acc
            acc = jnp.minimum(acc, mag[:, j])
        acc = jnp.full_like(mag[:, 0], _BIG)
        for j in reversed(range(d)):
            suf[j] = acc
            acc = jnp.minimum(acc, mag[:, j])
        total_sign = sgn[:, 0]
        for j in range(1, d):
            total_sign = total_sign * sgn[:, j]

        rows = []
        for j in range(d):
            rows.append(jnp.minimum(pre[j], suf[j]) * (total_sign * sgn[:, j]))
        part = jnp.stack(rows, axis=1).reshape(d * n * meta.Zp, bt)
        outs.append(post(part, base, d * n * meta.Zp) if post is not None else part)
    return jnp.concatenate(outs, axis=0)


_SP_EPS = 1e-7  # atanh clamp (reference BoostedNeuralLDPCDecoder.py:406-408)


def _cn_sumproduct_classes(v2c, meta: _TrainMeta, post=None):
    """Forward extrinsic sum-product (tanh domain) per degree class."""
    bt = v2c.shape[1]
    outs = []
    for base, d, n in _class_ranges(meta):
        seg = v2c[base : base + d * n * meta.Zp, :].reshape(n, d, meta.Zp, bt)
        t = jnp.tanh(0.5 * seg)
        pre = [None] * d
        suf = [None] * d
        acc = jnp.ones_like(t[:, 0])
        for j in range(d):
            pre[j] = acc
            acc = acc * t[:, j]
        acc = jnp.ones_like(t[:, 0])
        for j in reversed(range(d)):
            suf[j] = acc
            acc = acc * t[:, j]
        rows = []
        for j in range(d):
            ext = jnp.clip(pre[j] * suf[j], -1.0 + _SP_EPS, 1.0 - _SP_EPS)
            # Mosaic has no atanh lowering; 2*atanh(x) = log((1+x)/(1-x))
            rows.append(jnp.log((1.0 + ext) / (1.0 - ext)))
        part = jnp.stack(rows, axis=1).reshape(d * n * meta.Zp, bt)
        outs.append(post(part, base, d * n * meta.Zp) if post is not None else part)
    return jnp.concatenate(outs, axis=0)


def _cn_minsum_one(v2c_cls, d, n, meta: _TrainMeta):
    """One class's forward extrinsic min-sum (same math as _cn_minsum_classes)."""
    bt = v2c_cls.shape[1]
    seg = v2c_cls.reshape(n, d, meta.Zp, bt)
    mag = jnp.abs(seg)
    sgn = jnp.where(seg >= 0, 1.0, -1.0)
    pre = [None] * d
    acc = jnp.full_like(mag[:, 0], _BIG)
    for j in range(d):
        pre[j] = acc
        acc = jnp.minimum(acc, mag[:, j])
    suf = [None] * d
    acc = jnp.full_like(mag[:, 0], _BIG)
    for j in reversed(range(d)):
        suf[j] = acc
        acc = jnp.minimum(acc, mag[:, j])
    total_sign = sgn[:, 0]
    for j in range(1, d):
        total_sign = total_sign * sgn[:, j]
    rows = []
    for j in range(d):
        rows.append(jnp.minimum(pre[j], suf[j]) * (total_sign * sgn[:, j]))
    return jnp.stack(rows, axis=1).reshape(d * n * meta.Zp, bt)


def _cn_sumproduct_classes_one(v2c_cls, d, n, meta: _TrainMeta):
    """One class's forward extrinsic sum-product."""
    bt = v2c_cls.shape[1]
    seg = v2c_cls.reshape(n, d, meta.Zp, bt)
    t = jnp.tanh(0.5 * seg)
    pre = [None] * d
    suf = [None] * d
    acc = jnp.ones_like(t[:, 0])
    for j in range(d):
        pre[j] = acc
        acc = acc * t[:, j]
    acc = jnp.ones_like(t[:, 0])
    for j in reversed(range(d)):
        suf[j] = acc
        acc = acc * t[:, j]
    rows = []
    for j in range(d):
        ext = jnp.clip(pre[j] * suf[j], -1.0 + _SP_EPS, 1.0 - _SP_EPS)
        rows.append(jnp.log((1.0 + ext) / (1.0 - ext)))
    return jnp.stack(rows, axis=1).reshape(d * n * meta.Zp, bt)


def _cn_minsum_fwd_bwd_one(v2c_cls, d, n, meta: _TrainMeta, g_extrmin_fn):
    """Recompute ONE degree class's extrinsic min-sum AND backpropagate
    through it, replicating the XLA two-min formulation's autodiff exactly:

      m1 = min |v2c|; am = first-occurrence argmin; m2 = min excluding slot am
      extr_e = m2 if slot_e == am else m1
      g_m1 = sum over non-am edges of g_extr; g_m2 = g_extr at am
      g_|v2c|_j = g_m1 * [|v2c|_j == m1]/#ties(m1) + g_m2 * [masked_j == m2]/#ties(m2)
      g_v2c = g_|v2c| * (v2c >= 0 ? 1 : -1)        (JAX abs convention)

    ``g_extrmin_fn(c2v_cls)`` receives the class's forward result and returns
    (g_extrmin [nrows, bt], g_cnw, g_ucnw).  Single-class granularity keeps
    the mag/sgn/argmin temporaries' liveness at one class — the backward
    kernel streams classes and never materializes a full-code tensor beyond
    its VMEM scratches (the round-2 whole-code formulation spilled ~117 MB of
    registers at BG1 scale, measured 2026-08-17)."""
    bt = v2c_cls.shape[1]
    nrows = d * n * meta.Zp
    seg = v2c_cls.reshape(n, d, meta.Zp, bt)
    mag = jnp.abs(seg)
    sgn = jnp.where(seg >= 0, 1.0, -1.0)

    pre = [None] * d
    acc = jnp.full_like(mag[:, 0], _BIG)
    for j in range(d):
        pre[j] = acc
        acc = jnp.minimum(acc, mag[:, j])
    m1 = acc
    suf = [None] * d
    acc = jnp.full_like(mag[:, 0], _BIG)
    for j in reversed(range(d)):
        suf[j] = acc
        acc = jnp.minimum(acc, mag[:, j])
    total_sign = sgn[:, 0]
    for j in range(1, d):
        total_sign = total_sign * sgn[:, j]

    # first-occurrence argmin one-hot + second min over the masked array
    f = [(mag[:, j] == m1) & (pre[j] > m1) for j in range(d)]
    masked = [jnp.where(f[j], _BIG, mag[:, j]) for j in range(d)]
    m2 = masked[0]
    for j in range(1, d):
        m2 = jnp.minimum(m2, masked[j])

    extr_min = [jnp.where(f[j], m2, jnp.minimum(pre[j], suf[j])) for j in range(d)]
    extr_sgn = [total_sign * sgn[:, j] for j in range(d)]
    c2v_cls = jnp.stack(
        [extr_sgn[j] * extr_min[j] for j in range(d)], axis=1
    ).reshape(nrows, bt)

    g_extrmin, g_cnw, g_ucnw = g_extrmin_fn(c2v_cls)

    ge = g_extrmin.reshape(n, d, meta.Zp, bt)
    g_m1 = jnp.zeros_like(m1)
    g_m2 = jnp.zeros_like(m1)
    for j in range(d):
        g_m1 = g_m1 + jnp.where(f[j], 0.0, ge[:, j])
        g_m2 = g_m2 + jnp.where(f[j], ge[:, j], 0.0)
    t1 = [mag[:, j] == m1 for j in range(d)]
    c1 = t1[0].astype(jnp.float32)
    for j in range(1, d):
        c1 = c1 + t1[j]
    t2 = [(jnp.where(f[j], _BIG, mag[:, j]) == m2) for j in range(d)]
    c2 = t2[0].astype(jnp.float32)
    for j in range(1, d):
        c2 = c2 + t2[j]
    g1 = g_m1 / c1
    g2 = g_m2 / jnp.maximum(c2, 1.0)  # c2 == 0 only if deg < 2 (excluded)
    rows = []
    for j in range(d):
        g_mag_j = jnp.where(t1[j], g1, 0.0) + jnp.where(t2[j], g2, 0.0)
        rows.append(g_mag_j * jnp.where(mag[:, j] == 0.0, 1.0, sgn[:, j]))
    g_v2c = jnp.stack(rows, axis=1).reshape(nrows, bt)
    return g_v2c, g_cnw, g_ucnw


def _cn_sumproduct_fwd_bwd_one(v2c_cls, d, n, meta: _TrainMeta, g_fn):
    """Recompute ONE degree class's extrinsic sum-product AND backpropagate
    through it (round 4: SP training joins the fused tier).

    Forward (matches _cn_sumproduct_classes_one):
      t_j = tanh(v2c_j / 2); ext_j = pre_j * suf_j (exclude-self product via
      sequential prefix/suffix chains); extc = clip(ext, +-(1-eps));
      out_j = 2*atanh(extc) (log form — Mosaic has no atanh lowering).

    Backward mirrors the chains in reverse:
      g_extc = g_out * 2 / (1 - extc^2);  g_ext = g_extc * clip_mask
      g_pre_j = g_ext_j * suf_j;  g_suf_j = g_ext_j * pre_j
      chain cotangents give g_t, then g_v2c = g_t * (1 - t^2) / 2.

    ``g_fn(out_cls)`` is the post-chain adjoint (same closure as the min-sum
    path): returns (g_mag [nrows, bt] — gradient w.r.t. |out|, g_cnw,
    g_ucnw); the signed gradient is g_mag * d|out|/d out with JAX's abs
    convention (+1 at 0).  The XLA flat path computes the exclude-self
    product with jnp.cumprod (a log-depth scan), so gradients agree to
    roundoff, not bitwise — the parity tests' 1e-6/1e-4 tolerances hold."""
    bt = v2c_cls.shape[1]
    nrows = d * n * meta.Zp
    seg = v2c_cls.reshape(n, d, meta.Zp, bt)
    t = jnp.tanh(0.5 * seg)
    pre = [None] * d
    acc = jnp.ones_like(t[:, 0])
    for j in range(d):
        pre[j] = acc
        acc = acc * t[:, j]
    suf = [None] * d
    acc = jnp.ones_like(t[:, 0])
    for j in reversed(range(d)):
        suf[j] = acc
        acc = acc * t[:, j]
    lo_c, hi_c = -1.0 + _SP_EPS, 1.0 - _SP_EPS
    ext = [pre[j] * suf[j] for j in range(d)]
    extc = [jnp.clip(ext[j], lo_c, hi_c) for j in range(d)]
    out_cls = jnp.stack(
        [jnp.log((1.0 + extc[j]) / (1.0 - extc[j])) for j in range(d)], axis=1
    ).reshape(nrows, bt)

    g_mag, g_cnw, g_ucnw = g_fn(out_cls)

    gm = g_mag.reshape(n, d, meta.Zp, bt)
    o = out_cls.reshape(n, d, meta.Zp, bt)
    g_pre = [None] * d
    g_suf = [None] * d
    for j in range(d):
        g_out_j = gm[:, j] * jnp.where(o[:, j] == 0.0, 1.0,
                                       jnp.sign(o[:, j]))
        g_extc_j = g_out_j * 2.0 / (1.0 - extc[j] * extc[j])
        g_ext_j = g_extc_j * _clip_grad_mask(ext[j], lo_c, hi_c)
        g_pre[j] = g_ext_j * suf[j]
        g_suf[j] = g_ext_j * pre[j]

    g_t = [jnp.zeros_like(t[:, 0]) for _ in range(d)]
    # reverse the prefix chain: pre[j] = pre[j-1] * t[j-1]
    c = g_pre[d - 1]
    for j in range(d - 1, 0, -1):
        g_t[j - 1] = g_t[j - 1] + c * pre[j - 1]
        c = g_pre[j - 1] + c * t[:, j - 1]
    # reverse the suffix chain: suf[j] = suf[j+1] * t[j+1]
    c = g_suf[0]
    for j in range(d - 1):
        g_t[j + 1] = g_t[j + 1] + c * suf[j + 1]
        c = g_suf[j + 1] + c * t[:, j + 1]

    rows = [g_t[j] * 0.5 * (1.0 - t[:, j] * t[:, j]) for j in range(d)]
    g_v2c = jnp.stack(rows, axis=1).reshape(nrows, bt)
    return g_v2c, g_cnw, g_ucnw


def _ucn_mask_classes(sign_e, meta: _TrainMeta):
    """Per-edge unsatisfied-check indicator from routed decision signs."""
    bt = sign_e.shape[1]
    outs = []
    for base, d, n in _class_ranges(meta):
        seg = sign_e[base : base + d * n * meta.Zp, :].reshape(n, d, meta.Zp, bt)
        parity = seg[:, 0]
        for j in range(1, d):
            parity = parity * seg[:, j]
        ucn = jnp.where(parity < 0, 1.0, 0.0)
        outs.append(
            jnp.broadcast_to(ucn[:, None], (n, d, meta.Zp, bt)).reshape(
                d * n * meta.Zp, bt
            )
        )
    return jnp.concatenate(outs, axis=0)


def _ucn_mask_from_app(app, rt_ref, meta: _TrainMeta, routing_dtype):
    dsign = jnp.where(app < 0, -1.0, 1.0)
    s_route = _route_e_from_n(dsign, rt_ref, meta, routing_dtype)
    return _ucn_mask_classes(jnp.where(s_route < 0, -1.0, 1.0), meta)


def _syndrome_ok_lanes(app, rt_ref, meta: _TrainMeta, routing_dtype):
    """Per-word all-checks-satisfied flag [bt] from the final APP [NZp, bt].

    Routes the decision signs (one extra pass) and takes the min lifted-check
    parity per lane; pad rows carry +1 and cannot flip it."""
    dsign = jnp.where(app < 0, -1.0, 1.0)
    ok = None
    ranges = meta.chunks if meta.chunks else tuple(_class_ranges(meta))
    for base, d, n in ranges:
        ne, e0 = d * n, base // meta.Zp
        s_route = _route_e_rows(dsign, rt_ref, meta, routing_dtype, e0, e0 + ne)
        seg = jnp.where(s_route < 0, -1.0, 1.0).reshape(n, d, meta.Zp, app.shape[1])
        parity = seg[:, 0]
        for j in range(1, d):
            parity = parity * seg[:, j]
        m = parity.min(axis=(0, 1))  # [bt]
        ok = m if ok is None else jnp.minimum(ok, m)
    return jnp.where(ok > 0, 1.0, 0.0)


def _stats_rows(app, rt_ref, meta: _TrainMeta, routing_dtype):
    """All-zero-campaign per-word stats [8, bt] from the final APP: row 0 =
    syndrome satisfied, row 1 = bit errors (decisions < 0 on valid rows;
    pad rows hold 0 and never count), row 2 = frame error."""
    ok = _syndrome_ok_lanes(app, rt_ref, meta, routing_dtype)
    bit_err = jnp.sum(jnp.where(app < 0, 1.0, 0.0), axis=0)  # [bt]
    frame = jnp.where(bit_err > 0, 1.0, 0.0)
    zero = jnp.zeros_like(ok)
    return jnp.stack([ok, bit_err, frame] + [zero] * 5, axis=0)


def _ucn_mask_one(sign_rows, d: int, nc: int, meta: _TrainMeta):
    """One chunk's per-edge unsatisfied-check indicator from routed decision
    signs (chunks align to whole checks, so parity is chunk-local)."""
    bt = sign_rows.shape[1]
    seg = sign_rows.reshape(nc, d, meta.Zp, bt)
    parity = seg[:, 0]
    for j in range(1, d):
        parity = parity * seg[:, j]
    ucn = jnp.where(parity < 0, 1.0, 0.0)
    return jnp.broadcast_to(ucn[:, None], (nc, d, meta.Zp, bt)).reshape(
        d * nc * meta.Zp, bt
    )


# ---------------------------------------------------------------------------
# Forward kernel: grid (batch_tiles, iterations), one BP iteration per step
# ---------------------------------------------------------------------------
def _fwd_kernel(meta: _TrainMeta, routing_dtype, chan_ref, chanq_ref, rt_ref, r_ref,
                cnw_ref, vnw_ref, ucnw_ref, *refs):
    widx_ref = None
    if meta.sample_channel:
        if meta.sample_at_idx:
            seed_ref, sigma_ref, widx_ref, *refs = refs
        else:
            seed_ref, sigma_ref, *refs = refs
    chan_out_ref = None
    if meta.store_msgs:
        out_ref, store_ref, *rest = refs
    elif meta.emit_syndrome:
        out_ref, syn_ref, *rest = refs
    elif meta.emit_chan:
        out_ref, chan_out_ref, *rest = refs
    else:
        out_ref, *rest = refs
    if meta.sample_channel:
        msg_scr, sums_scr, chan_scr = rest
    else:
        msg_scr, sums_scr = rest
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        msg_scr[:] = jnp.zeros_like(msg_scr)
        sums_scr[:] = jnp.zeros_like(sums_scr)

    if meta.store_msgs:
        store_ref[0] = msg_scr[:]  # message state ENTERING iteration i

    if meta.sample_channel:
        # in-kernel AWGN sampling (all-zero words, standard convention
        # bit0 -> +1): a counter-based keyed hash (two lowbias32 mixing
        # rounds — pure jnp uint32 ops, so the SAME stream runs on the TPU
        # and in CPU interpret mode) feeds Box-Muller; llr = 2(1 + sigma*n)
        # / sigma^2 lands in VMEM and the XLA threefry sample + [NZp, B]
        # HBM llr round-trip disappear.  Sampled once per batch tile
        # (i == 0); iterations re-read the scratch.
        bi_tile = pl.program_id(0)

        @pl.when(i == 0)
        def _sample_chan():
            full = chan_scr.shape
            # Box-Muller yields a PAIR of normals per (u1, u2); generate for
            # half the rows and use both cos and sin — halves the hash and
            # transcendental count per value (int32 multiplies and
            # transcendentals are the expensive ops on the VPU)
            half = _round8(-(-full[0] // 2))
            shape = (half, full[1])
            rowc = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            if meta.sample_at_idx:
                # reproduce the stream of a phase-1 sampler with tile width
                # bt1: word w was sampled in tile (w >> log2(bt1)) at column
                # (w & (bt1-1)) — rebuild its key/counter from the ORIGINAL
                # index regardless of this kernel's own tile layout
                bt1 = int(meta.sample_at_idx)
                shift = bt1.bit_length() - 1
                w = widx_ref[0, :].astype(jnp.uint32)  # [bt] original index
                key = (seed_ref[0].astype(jnp.uint32) ^ (
                    (w >> shift) * jnp.uint32(2654435761)))[None, :]
                idx = rowc * jnp.uint32(bt1) + (w & jnp.uint32(bt1 - 1))[None, :]
            else:
                key = seed_ref[0].astype(jnp.uint32) ^ (
                    bi_tile.astype(jnp.uint32) * jnp.uint32(2654435761)
                )
                colc = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
                idx = rowc * jnp.uint32(shape[1]) + colc

            def _mix(h):  # lowbias32: full-avalanche 32-bit finalizer
                h = h ^ (h >> 16)
                h = h * jnp.uint32(0x7FEB352D)
                h = h ^ (h >> 15)
                h = h * jnp.uint32(0x846CA68B)
                return h ^ (h >> 16)

            def _unit_uniform(draw):
                h = _mix((idx * jnp.uint32(2) + jnp.uint32(draw)) ^ key)
                h = _mix(h ^ (key * jnp.uint32(0x9E3779B9)))
                # 24-bit mantissa resolution in [0, 1); Mosaic has no
                # uint32->f32 cast, so hop through int32 (value < 2^24)
                return (h >> 8).astype(jnp.int32).astype(jnp.float32) * (
                    1.0 / 16777216.0)

            u1 = _unit_uniform(0)
            u2 = _unit_uniform(1)
            # 1 - u1 in (0, 1]: log is finite, |n| caps at ~5.8 sigma (same
            # tail reach as f32 threefry normals)
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
            theta = (2.0 * np.pi) * u2
            sigma = sigma_ref[0]
            base, scale = 2.0 / (sigma * sigma), 2.0 / sigma

            def _mask_pad(llr, row0):
                if meta.Zp == meta.Z:
                    return llr
                rowz = row0 + jax.lax.broadcasted_iota(jnp.int32, llr.shape, 0)
                return jnp.where(rowz % meta.Zp < meta.Z, llr, 0.0)

            # two static scratch writes (an in-kernel concatenate hangs the
            # Mosaic compile at this shape)
            chan_scr[0:half] = _mask_pad(base + scale * (r * jnp.cos(theta)), 0)
            lo = full[0] - half
            chan_scr[half:full[0]] = _mask_pad(
                base + scale * (r[:lo] * jnp.sin(theta[:lo])), half)

        chan = chan_scr[:]
    else:
        chan = chan_ref[:]
    # MS has no channel quantizer: chanq IS chan, and the separate stream is
    # dropped (a dummy ref rides in its place) — at BG1 scale the extra
    # [NZp, bt] window was the difference between fitting VMEM and not
    if meta.qms_qbit is not None:
        chan_out = _quantize(chan, meta.qms_qbit) if meta.sample_channel else chanq_ref[:]
    else:
        chan_out = chan

    if meta.emit_chan:
        @pl.when(i == 0)
        def _write_chan():
            chan_out_ref[:] = chan

    if meta.has_vn_w:
        xa = chan * _w_vn(vnw_ref, meta)
        xa_q = _quantize(xa, meta.qms_qbit) if meta.qms_qbit is not None else xa
    else:
        xa_q = chan_out  # = Q(chan) under QMS, chan otherwise

    if meta.has_ucn:
        prev_app = jnp.clip(chan_out + sums_scr[:], meta.clip_lo, meta.clip_hi)
        app = jnp.where(i == 0, xa_q, prev_app)
        ucn_mask = _ucn_mask_from_app(app, rt_ref, meta, routing_dtype)

    vn_total = xa_q + sums_scr[:]

    def _post(c2v_part, base, nrows):
        # weighting + ReLU + clip/quantize + re-sign (reference :431-512),
        # fused per class while the c2v rows are live
        bt_k = c2v_part.shape[1]
        w_mag = jnp.abs(c2v_part)
        if meta.has_ucn:
            u = ucn_mask[base : base + nrows]
            w_mag = w_mag * (
                _w_rows(cnw_ref, meta, base, nrows, bt_k) * (1.0 - u)
                + _w_rows(ucnw_ref, meta, base, nrows, bt_k) * u
            )
        elif meta.has_cn_w:
            w_mag = w_mag * _w_rows(cnw_ref, meta, base, nrows, bt_k)
        w_mag = jnp.maximum(w_mag, 0.0)
        w_mag = _clip_or_quant(w_mag, meta)
        return w_mag * jnp.sign(c2v_part)

    if meta.routing == "roll":
        # class-streamed forward: no full routed/v2c materialization or
        # concat — bit-identical to the whole-array form, +4% on BG2 and
        # smaller liveness at BG1 scale (measured r3); matmul routing keeps
        # the whole-array form (its MXU ops want the full operand anyway)
        acc = [None] * meta.N
        for base, d, n in _class_ranges(meta):
            nrows = d * n * meta.Zp
            ne, e0 = d * n, base // meta.Zp
            routed_cls = _route_e_rows(vn_total, rt_ref, meta, routing_dtype, e0, e0 + ne)
            v2c_cls = _clip_or_quant(routed_cls - msg_scr[base : base + nrows, :], meta)
            if meta.sum_product:
                part = _cn_sumproduct_classes_one(v2c_cls, d, n, meta)
            else:
                part = _cn_minsum_one(v2c_cls, d, n, meta)
            part = _post(part, base, nrows)
            msg_scr[base : base + nrows, :] = part
            for k in range(ne):
                e = e0 + k
                nn = meta.vn_of_edge[e]
                c = _roll_z(part[k * meta.Zp : (k + 1) * meta.Zp], -meta.shift_of_edge[e], meta)
                acc[nn] = c if acc[nn] is None else acc[nn] + c
        zero = jnp.zeros((meta.Zp, vn_total.shape[1]), jnp.float32)
        sums_scr[:] = jnp.concatenate([a if a is not None else zero for a in acc], axis=0)
    else:
        routed = _route_e_from_n(vn_total, rt_ref, meta, routing_dtype)
        v2c = _clip_or_quant(routed - msg_scr[:], meta)
        if meta.sum_product:
            new_msg = _cn_sumproduct_classes(v2c, meta, post=_post)
        else:
            new_msg = _cn_minsum_classes(v2c, meta, post=_post)
        msg_scr[:] = new_msg
        sums_scr[:] = _route_n_from_e(new_msg, r_ref, meta, routing_dtype, quantized=True)
    # PRE-clip APP: the final clip is differentiated outside the kernel
    if meta.emit_stats:
        @pl.when(i == meta.n_iterations - 1)
        def _write_stats():
            out_ref[0] = _stats_rows(
                chan_out + sums_scr[:], rt_ref, meta, routing_dtype
            )
    elif meta.stream_outputs:
        out_ref[0] = chan_out + sums_scr[:]
    else:
        @pl.when(i == meta.n_iterations - 1)
        def _write_final():
            out_ref[0] = chan_out + sums_scr[:]

    if meta.emit_syndrome:
        @pl.when(i == meta.n_iterations - 1)
        def _write_syndrome():
            ok = _syndrome_ok_lanes(
                chan_out + sums_scr[:], rt_ref, meta, routing_dtype
            )
            syn_ref[:] = jnp.broadcast_to(ok[None, :], syn_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("meta", "bt", "routing_dtype", "interpret")
)
def _fwd_run(chan, chanq, rt, r, cnw, vnw, ucnw, meta: _TrainMeta, bt: int,
             routing_dtype, interpret, seed=None, sigma=None, widx=None):
    NZp, B = (meta.NZp, chan.shape[1]) if meta.sample_channel else chan.shape
    EZp = meta.E * meta.Zp
    I = meta.n_iterations
    grid = (B // bt, I)
    kernel = functools.partial(_fwd_kernel, meta, routing_dtype)
    iter_block = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i: (i,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    if meta.emit_stats:
        out_shapes = [jax.ShapeDtypeStruct((1, 8, B), jnp.float32)]
        out_specs = [
            pl.BlockSpec((1, 8, bt), lambda bi, i: (0, 0, bi), memory_space=pltpu.VMEM)
        ]
    elif meta.stream_outputs:
        out_shapes = [jax.ShapeDtypeStruct((I, NZp, B), jnp.float32)]
        out_specs = [
            pl.BlockSpec((1, NZp, bt), lambda bi, i: (i, 0, bi), memory_space=pltpu.VMEM)
        ]
    else:
        out_shapes = [jax.ShapeDtypeStruct((1, NZp, B), jnp.float32)]
        out_specs = [
            pl.BlockSpec((1, NZp, bt), lambda bi, i: (0, 0, bi), memory_space=pltpu.VMEM)
        ]
    if meta.store_msgs:
        out_shapes.append(jax.ShapeDtypeStruct((I, EZp, B), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, EZp, bt), lambda bi, i: (i, 0, bi), memory_space=pltpu.VMEM)
        )
    if meta.emit_chan:
        out_shapes.append(jax.ShapeDtypeStruct((NZp, B), jnp.float32))
        out_specs.append(
            pl.BlockSpec((NZp, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        )
    if meta.emit_syndrome:
        out_shapes.append(jax.ShapeDtypeStruct((8, B), jnp.float32))
        out_specs.append(
            pl.BlockSpec((8, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        )
    chan_spec = (
        # sampled mode: chan is an [8, B] dummy that only carries B; tile it
        pl.BlockSpec((8, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        if meta.sample_channel
        else pl.BlockSpec((NZp, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
    )
    chanq_spec = (
        pl.BlockSpec((NZp, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        if meta.qms_qbit is not None and not meta.sample_channel
        else pl.BlockSpec(chanq.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
    )
    in_specs = [
        chan_spec,
        chanq_spec,
        pl.BlockSpec(rt.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(r.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        iter_block((1,) + cnw.shape[1:]),
        iter_block((1,) + vnw.shape[1:]),
        iter_block((1,) + ucnw.shape[1:]),
    ]
    args = [chan, chanq, rt, r, cnw, vnw, ucnw]
    scratch = [
        pltpu.VMEM((EZp, bt), jnp.float32),
        pltpu.VMEM((NZp, bt), jnp.float32),
    ]
    if meta.sample_channel:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [jnp.asarray(seed, jnp.int32).reshape(1),
                 jnp.asarray(sigma, jnp.float32).reshape(1)]
        if meta.sample_at_idx:
            in_specs.append(pl.BlockSpec((1, bt), lambda bi, i: (0, bi),
                                         memory_space=pltpu.VMEM))
            args.append(widx.astype(jnp.int32).reshape(1, B))
        scratch.append(pltpu.VMEM((NZp, bt), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=meta.vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if meta.store_msgs:
        return res[0], res[1], None, None
    if meta.emit_syndrome:
        return res[0], None, res[1], None
    if meta.emit_chan:
        return res[0], None, None, res[1]
    return (res[0] if isinstance(res, (tuple, list)) else res), None, None, None


# ---------------------------------------------------------------------------
# Big-code forward kernel: HBM-resident message state, per-chunk DMA streaming
# ---------------------------------------------------------------------------
def _fwd_kernel_hbm(meta: _TrainMeta, routing_dtype, chan_ref, chanq_ref,
                    cnw_ref, vnw_ref, ucnw_ref, out_ref, store_ref, *refs):
    """One BP iteration per grid step with the [E*Zp, bt] message state in
    HBM.  Training mode: the entering state of iteration i is read from store
    slot i-1 and the new messages are written to slot i — the store the
    backward needs doubles as the carry, so streaming adds no HBM traffic
    beyond what training stores anyway.  Decode mode: one slot, read-modify-
    write.  Roll routing only (matmul operands at this scale dwarf VMEM)."""
    if meta.emit_syndrome:
        syn_ref, sums_scr, rbounce, wbounce, rsem, wsem = refs
    else:
        sums_scr, rbounce, wbounce, rsem, wsem = refs
    I = meta.n_iterations
    bi, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        sums_scr[:] = jnp.zeros_like(sums_scr)

    chan = chan_ref[:]
    chan_out = chanq_ref[:] if meta.qms_qbit is not None else chan
    if meta.has_vn_w:
        xa = chan * _w_vn(vnw_ref, meta)
        xa_q = _quantize(xa, meta.qms_qbit) if meta.qms_qbit is not None else xa
    else:
        xa_q = chan_out
    if meta.has_ucn:
        prev_app = jnp.clip(chan_out + sums_scr[:], meta.clip_lo, meta.clip_hi)
        app = jnp.where(i == 0, xa_q, prev_app)
        dsign = jnp.where(app < 0, -1.0, 1.0)
    vn_total = xa_q + sums_scr[:]
    bt_k = vn_total.shape[1]

    rslot = jnp.maximum(i - 1, 0) if meta.store_msgs else 0
    wslot = i if meta.store_msgs else 0

    acc = [None] * meta.N
    for base, d, nc in meta.chunks:
        nrows = d * nc * meta.Zp
        ne, e0 = d * nc, base // meta.Zp

        @pl.when(i != 0)
        def _read(base=base, nrows=nrows, rslot=rslot):
            cp = pltpu.make_async_copy(
                store_ref.at[rslot, bi, pl.ds(base, nrows), :],
                rbounce.at[pl.ds(0, nrows), :], rsem,
            )
            cp.start()
            cp.wait()

        old = jnp.where(i == 0, 0.0, rbounce[pl.ds(0, nrows), :])
        routed = _route_e_rows(vn_total, None, meta, routing_dtype, e0, e0 + ne)
        v2c = _clip_or_quant(routed - old, meta)
        if meta.sum_product:
            part = _cn_sumproduct_classes_one(v2c, d, nc, meta)
        else:
            part = _cn_minsum_one(v2c, d, nc, meta)
        # post-CN weighting chain (reference :431-512), chunk-local
        w_mag = jnp.abs(part)
        if meta.has_ucn:
            s_route = _route_e_rows(dsign, None, meta, routing_dtype, e0, e0 + ne)
            u = _ucn_mask_one(jnp.where(s_route < 0, -1.0, 1.0), d, nc, meta)
            w_mag = w_mag * (
                _w_rows(cnw_ref, meta, base, nrows, bt_k) * (1.0 - u)
                + _w_rows(ucnw_ref, meta, base, nrows, bt_k) * u
            )
        elif meta.has_cn_w:
            w_mag = w_mag * _w_rows(cnw_ref, meta, base, nrows, bt_k)
        w_mag = jnp.maximum(w_mag, 0.0)
        w_mag = _clip_or_quant(w_mag, meta)
        part = w_mag * jnp.sign(part)

        # the final iteration's messages are dead — skip the writeback
        @pl.when(i != I - 1)
        def _write(part=part, base=base, nrows=nrows, wslot=wslot):
            wbounce[pl.ds(0, nrows), :] = part
            cp = pltpu.make_async_copy(
                wbounce.at[pl.ds(0, nrows), :],
                store_ref.at[wslot, bi, pl.ds(base, nrows), :], wsem,
            )
            cp.start()
            cp.wait()

        for k in range(ne):
            e = e0 + k
            nn = meta.vn_of_edge[e]
            c = _roll_z(part[k * meta.Zp : (k + 1) * meta.Zp], -meta.shift_of_edge[e], meta)
            acc[nn] = c if acc[nn] is None else acc[nn] + c

    zero = jnp.zeros((meta.Zp, bt_k), jnp.float32)
    sums_scr[:] = jnp.concatenate([a if a is not None else zero for a in acc], axis=0)
    if meta.emit_stats:
        @pl.when(i == I - 1)
        def _write_stats_hbm():
            out_ref[0] = _stats_rows(
                chan_out + sums_scr[:], None, meta, routing_dtype
            )
    elif meta.stream_outputs:
        out_ref[0] = chan_out + sums_scr[:]
    else:
        @pl.when(i == I - 1)
        def _write_final():
            out_ref[0] = chan_out + sums_scr[:]

    if meta.emit_syndrome:
        @pl.when(i == I - 1)
        def _write_syndrome_hbm():
            ok = _syndrome_ok_lanes(
                chan_out + sums_scr[:], None, meta, routing_dtype
            )
            syn_ref[:] = jnp.broadcast_to(ok[None, :], syn_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("meta", "bt", "routing_dtype", "interpret")
)
def _fwd_run_hbm(chan, chanq, cnw, vnw, ucnw, meta: _TrainMeta, bt: int,
                 routing_dtype, interpret):
    NZp, B = chan.shape
    EZp = meta.E * meta.Zp
    I = meta.n_iterations
    nb = B // bt
    slots = max(I - 1, 1) if meta.store_msgs else 1
    kernel = functools.partial(_fwd_kernel_hbm, meta, routing_dtype)
    iter_block = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i: (i,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    if meta.emit_stats:
        out0_shape = jax.ShapeDtypeStruct((1, 8, B), jnp.float32)
        out0_spec = pl.BlockSpec((1, 8, bt), lambda bi, i: (0, 0, bi), memory_space=pltpu.VMEM)
    elif meta.stream_outputs:
        out0_shape = jax.ShapeDtypeStruct((I, NZp, B), jnp.float32)
        out0_spec = pl.BlockSpec((1, NZp, bt), lambda bi, i: (i, 0, bi), memory_space=pltpu.VMEM)
    else:
        out0_shape = jax.ShapeDtypeStruct((1, NZp, B), jnp.float32)
        out0_spec = pl.BlockSpec((1, NZp, bt), lambda bi, i: (0, 0, bi), memory_space=pltpu.VMEM)
    chanq_spec = (
        pl.BlockSpec((NZp, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        if meta.qms_qbit is not None
        else pl.BlockSpec(chanq.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
    )
    out_specs = [out0_spec, pl.BlockSpec(memory_space=pltpu.HBM)]
    out_shapes = [out0_shape,
                  jax.ShapeDtypeStruct((slots, nb, EZp, bt), jnp.float32)]
    if meta.emit_syndrome:
        out_specs.append(
            pl.BlockSpec((8, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((8, B), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(nb, I),
        in_specs=[
            pl.BlockSpec((NZp, bt), lambda bi, i: (0, bi), memory_space=pltpu.VMEM),
            chanq_spec,
            iter_block((1,) + cnw.shape[1:]),
            iter_block((1,) + vnw.shape[1:]),
            iter_block((1,) + ucnw.shape[1:]),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((NZp, bt), jnp.float32),
            pltpu.VMEM((meta.chunk_rows, bt), jnp.float32),
            pltpu.VMEM((meta.chunk_rows, bt), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=meta.vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(chan, chanq, cnw, vnw, ucnw)
    outs, store = res[0], res[1]
    return (outs, store if meta.store_msgs else None,
            res[2] if meta.emit_syndrome else None)


# ---------------------------------------------------------------------------
# Backward kernel: reversed grid, adjoint of one BP iteration per step
# ---------------------------------------------------------------------------
def _bwd_kernel(meta: _TrainMeta, routing_dtype,
                chan_ref, chanq_ref, rt_ref, r_ref, cnw_ref, vnw_ref, ucnw_ref,
                store_ref, prevout_ref, gout_ref,
                gcnw_ref, gvnw_ref, gucnw_ref, gchan_ref, gchanq_ref,
                gmsg_scr, gsums_scr):
    I = meta.n_iterations
    j = pl.program_id(1)
    i = I - 1 - j  # the iteration this step differentiates

    @pl.when(j == 0)
    def _init():
        gmsg_scr[:] = jnp.zeros_like(gmsg_scr)
        gsums_scr[:] = jnp.zeros_like(gsums_scr)
        gchan_ref[:] = jnp.zeros_like(gchan_ref)
        gchanq_ref[:] = jnp.zeros_like(gchanq_ref)

    # without a channel quantizer chanq IS chan — its gradient contributions
    # belong to gchan and gchanq stays a dummy
    gq_ref = gchanq_ref if meta.qms_qbit is not None else gchan_ref

    chan = chan_ref[:]
    chan_out = chanq_ref[:] if meta.qms_qbit is not None else chan
    msg_prev = store_ref[0]  # message state entering iteration i
    g_out = gout_ref[0]  # cotangent of the PRE-clip APP of iteration i

    # ---- recompute iteration i's forward intermediates ----
    sums_prev = _route_n_from_e(msg_prev, r_ref, meta, routing_dtype, quantized=True)

    if meta.has_vn_w:
        vnw_flat = _w_vn(vnw_ref, meta)
        xa = chan * vnw_flat
        if meta.qms_qbit is not None:
            xa_q = _quantize(xa, meta.qms_qbit)
            lo_q, hi_q, _ = _QMS_TABLE[meta.qms_qbit]
            mask_xa = _clip_grad_mask(xa, lo_q, hi_q)
        else:
            xa_q = xa
            mask_xa = jnp.ones_like(xa)
    else:
        xa_q = chan_out

    if meta.has_ucn:
        prev_pre = prevout_ref[0]  # pre-clip APP of iteration i-1 (garbage at i=0)
        prev_app = jnp.clip(prev_pre, meta.clip_lo, meta.clip_hi)
        app = jnp.where(i == 0, xa_q, prev_app)
        ucn_mask = _ucn_mask_from_app(app, rt_ref, meta, routing_dtype)
        scn_mask = 1.0 - ucn_mask

    vn_total = xa_q + sums_prev
    lo_m, hi_m = _msg_range(meta)

    # ---- adjoint of the post-CN chain, streamed one degree class at a time
    # (a whole-code formulation keeps v2c/masks/cotangents for every class
    # live simultaneously and spilled ~117 MB of registers at BG1 scale) ----
    # out_pre_i = chan_out + sums_i  ->  g_sums_i = g_out (+ carry)
    g_sums_total = gsums_scr[:] + g_out
    bt_k = g_out.shape[1]

    if meta.int8_routing and meta.routing == "matmul":
        # int8 routing pre-clips the VN total to +-2*q_hi (value-exact for the
        # forward: the quantizer saturates anyway), but the XLA gradient
        # semantics see the UNCLIPPED total — a saturated total lands v2c_pre
        # exactly on the quantizer boundary here (mask 0.5) where the true
        # value is strictly beyond it (mask 0).  Route a -1/0/+1 saturation
        # indicator (exact in int8) and zero those boundary masks.
        _, q_hi8, _ = _QMS_TABLE[meta.qms_qbit]
        t_clip8 = 2.0 * q_hi8
        sat_n = (jnp.where(vn_total > t_clip8, 1.0, 0.0)
                 - jnp.where(vn_total < -t_clip8, 1.0, 0.0)).astype(jnp.int8)

    acc = [None] * meta.N  # roll mode: per-VN g_T accumulators
    g_T_mm = None  # matmul mode: full [NZp, bt] accumulator
    g_cnw_parts, g_ucnw_parts = [], []

    # small codes (column weight layout): whole-array recompute is faster
    # (the per-class ref reloads and strictly sequenced scratch writes cost
    # ~17% on wman training); large codes stream per class to keep register
    # liveness at one class (whole-array spilled ~100 MB at BG1 scale)
    stream_bwd = meta.w_layout == "lane"
    if not stream_bwd:
        routed_full = _route_e_from_n(vn_total, rt_ref, meta, routing_dtype)
        v2c_pre_full = routed_full - msg_prev
        g_msg_full = gmsg_scr[:] + _route_e_from_n(
            g_sums_total, rt_ref, meta, routing_dtype, grad=True
        )

    for base, d, n in _class_ranges(meta):
        nrows = d * n * meta.Zp
        ne, e0 = d * n, base // meta.Zp

        # recompute this class's forward intermediates
        if stream_bwd:
            routed_cls = _route_e_rows(vn_total, rt_ref, meta, routing_dtype, e0, e0 + ne)
            msg_prev_cls = store_ref[0, base : base + nrows, :]
            v2c_pre = routed_cls - msg_prev_cls
        else:
            v2c_pre = v2c_pre_full[base : base + nrows]
        mask_cls = _clip_grad_mask(v2c_pre, lo_m, hi_m)
        if meta.int8_routing and meta.routing == "matmul":
            rt8 = rt_ref[base : base + nrows, :]
            sat = jnp.dot(rt8, sat_n, preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            at_hi = (sat > 0) & (v2c_pre == hi_m)
            at_lo = (sat < 0) & (v2c_pre == lo_m)
            mask_cls = jnp.where(at_hi | at_lo, 0.0, mask_cls)
        v2c_cls = _clip_or_quant(v2c_pre, meta)

        # message cotangent entering this iteration, class rows only:
        # sums_i = R @ msg_i  ->  g_msg_i += R^T @ g_sums_i  (+ carry)
        if stream_bwd:
            g_msg_cls = gmsg_scr[base : base + nrows, :] + _route_e_rows(
                g_sums_total, rt_ref, meta, routing_dtype, e0, e0 + ne, grad=True
            )
        else:
            g_msg_cls = g_msg_full[base : base + nrows]

        def g_extrmin_fn(c2v, base=base, nrows=nrows, ne=ne, e0=e0,
                         g_msg_cls=g_msg_cls):
            mag = jnp.abs(c2v)  # == extrinsic min, >= 0
            if meta.has_ucn:
                w_eff = (
                    _w_rows(cnw_ref, meta, base, nrows, bt_k)
                    * scn_mask[base : base + nrows]
                    + _w_rows(ucnw_ref, meta, base, nrows, bt_k)
                    * ucn_mask[base : base + nrows]
                )
            elif meta.has_cn_w:
                w_eff = _w_rows(cnw_ref, meta, base, nrows, bt_k)
            else:
                w_eff = jnp.ones_like(mag)
            wm_pre = mag * w_eff
            wm_relu = jnp.maximum(wm_pre, 0.0)
            # msg_i = Q(wm_relu) * sign(c2v); sign() has no gradient
            s_nz = jnp.sign(c2v)
            g_wm_q = g_msg_cls * s_nz
            g_wm_relu = g_wm_q * _clip_grad_mask(wm_relu, lo_m, hi_m)
            g_wm_pre = g_wm_relu * _relu_grad_mask(wm_pre)
            g_w = g_wm_pre * mag
            if meta.has_ucn:
                g_cnw = _g_edge_w(g_w * scn_mask[base : base + nrows], meta, ne)
                g_ucnw = _g_edge_w(g_w * ucn_mask[base : base + nrows], meta, ne)
            elif meta.has_cn_w:
                g_cnw = _g_edge_w(g_w, meta, ne)
                g_ucnw = None
            else:
                g_cnw = None
                g_ucnw = None
            g_extrmin = g_wm_pre * w_eff  # |c2v| grad cancels the sign exactly
            return g_extrmin, g_cnw, g_ucnw

        cn_fwd_bwd = (_cn_sumproduct_fwd_bwd_one if meta.sum_product
                      else _cn_minsum_fwd_bwd_one)
        g_v2c_cls, g_cnw_p, g_ucnw_p = cn_fwd_bwd(
            v2c_cls, d, n, meta, g_extrmin_fn
        )
        g_cnw_parts.append(g_cnw_p)
        g_ucnw_parts.append(g_ucnw_p)

        g_v2c_pre = g_v2c_cls * mask_cls
        # v2c_pre = routed - msg_prev: message-carry cotangent for step i-1
        gmsg_scr[base : base + nrows, :] = -g_v2c_pre
        # routed = R^T @ T: accumulate this class's contribution to g_T
        if meta.routing == "roll":
            for k in range(ne):
                e = e0 + k
                nn = meta.vn_of_edge[e]
                c = _roll_z(
                    g_v2c_pre[k * meta.Zp : (k + 1) * meta.Zp],
                    -meta.shift_of_edge[e], meta,
                )
                acc[nn] = c if acc[nn] is None else acc[nn] + c
        else:
            r_cls = r_ref[:, base : base + nrows]
            if meta.exact_matmul:
                contrib = _dot_split3(r_cls, g_v2c_pre)
            else:
                contrib = jnp.dot(
                    r_cls, g_v2c_pre.astype(routing_dtype),
                    preferred_element_type=jnp.float32,
                )
            g_T_mm = contrib if g_T_mm is None else g_T_mm + contrib

    if meta.routing == "roll":
        zero = jnp.zeros((meta.Zp, bt_k), jnp.float32)
        g_T = jnp.concatenate([a if a is not None else zero for a in acc], axis=0)
    else:
        g_T = g_T_mm
    gsums_scr[:] = g_T  # cotangent of sums_{i-1}, consumed by the next step

    g_cnw_i = None if g_cnw_parts[0] is None else jnp.concatenate(g_cnw_parts, axis=0)
    g_ucnw_i = None if g_ucnw_parts[0] is None else jnp.concatenate(g_ucnw_parts, axis=0)

    # channel-side gradients
    gq_ref[:] += g_out  # out_pre_i = chanq + sums_i

    def _pad_edge_g(g):
        if meta.w_layout == "col":
            return g  # already [EZp, 1]
        return jnp.pad(g, ((0, meta.Ep8 - meta.E), (0, 0)))

    if meta.has_vn_w:
        g_xa = g_T * mask_xa
        if meta.w_layout == "col":
            gvnw_ref[0, 0] = jnp.sum(g_xa * chan, axis=1, keepdims=True)
        else:
            g_vn = (g_xa * chan).reshape(meta.N, meta.Zp, g_xa.shape[1]).sum(axis=1)
            gvnw_ref[0, 0] = jnp.pad(g_vn, ((0, meta.Np8 - meta.N), (0, 0)))
        gchan_ref[:] += g_xa * vnw_flat
    else:
        gq_ref[:] += g_T  # xa_q IS chanq
        gvnw_ref[0, 0] = jnp.zeros_like(gvnw_ref[0, 0])
    gcnw_ref[0, 0] = (
        _pad_edge_g(g_cnw_i) if g_cnw_i is not None
        else jnp.zeros_like(gcnw_ref[0, 0])
    )
    gucnw_ref[0, 0] = (
        _pad_edge_g(g_ucnw_i) if g_ucnw_i is not None
        else jnp.zeros_like(gucnw_ref[0, 0])
    )


@functools.partial(
    jax.jit, static_argnames=("meta", "bt", "routing_dtype", "interpret")
)
def _bwd_run(chan, chanq, rt, r, cnw, vnw, ucnw, store, outs, g_outs,
             meta: _TrainMeta, bt: int, routing_dtype, interpret):
    NZp, B = chan.shape
    EZp = meta.E * meta.Zp
    I = meta.n_iterations
    nb = B // bt
    grid = (nb, I)
    kernel = functools.partial(_bwd_kernel, meta, routing_dtype)
    rev = lambda j: I - 1 - j  # noqa: E731
    chanq_spec = (
        pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM)
        if meta.qms_qbit is not None
        else pl.BlockSpec(chanq.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM)
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM),
            chanq_spec,
            pl.BlockSpec(rt.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(r.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + cnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + vnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + ucnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EZp, bt), lambda bi, j: (rev(j), 0, bi), memory_space=pltpu.VMEM),
            # pre-clip APP of iteration i-1 (block 0 read harmlessly at i=0)
            pl.BlockSpec(
                (1, NZp, bt),
                lambda bi, j: (jnp.maximum(rev(j) - 1, 0), 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, NZp, bt), lambda bi, j: (rev(j), 0, bi), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1) + cnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + vnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + ucnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM)
                if meta.qms_qbit is not None
                else pl.BlockSpec(chanq.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, I) + cnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((nb, I) + vnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((nb, I) + ucnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((NZp, B), jnp.float32),
            jax.ShapeDtypeStruct(
                (NZp, B) if meta.qms_qbit is not None else chanq.shape, jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((EZp, bt), jnp.float32),
            pltpu.VMEM((NZp, bt), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=meta.vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(chan, chanq, rt, r, cnw, vnw, ucnw, store, outs, g_outs)
    g_cnw_b, g_vnw_b, g_ucnw_b, g_chan, g_chanq = res
    return (
        g_cnw_b.sum(axis=0),  # [I, EZp, 1]
        g_vnw_b.sum(axis=0),  # [I, NZp, 1]
        g_ucnw_b.sum(axis=0),
        g_chan,
        g_chanq,
    )


# ---------------------------------------------------------------------------
# Big-code backward kernel: HBM store + HBM gradient carry, chunk-streamed
# ---------------------------------------------------------------------------
def _bwd_kernel_hbm(meta: _TrainMeta, routing_dtype,
                    chan_ref, chanq_ref, cnw_ref, vnw_ref, ucnw_ref,
                    prevout_ref, gout_ref, store_ref,
                    gcnw_ref, gvnw_ref, gucnw_ref, gchan_ref, gchanq_ref,
                    gmsg_ref,
                    gsums_scr, rbounce, gbounce, wbounce, rsem, gsem, wsem):
    """Adjoint of one BP iteration per grid step with the message store AND
    the adjoint message carry in HBM.  Pass 1 rebuilds sums_{i-1} from the
    stored entering state in the forward's exact per-edge accumulation order;
    pass 2 re-reads each chunk, recomputes its forward intermediates, and
    backpropagates — register liveness stays bounded by one chunk (the
    round-3 whole-code formulation spilled ~100 MB at BG1 scale)."""
    I = meta.n_iterations
    bi, j = pl.program_id(0), pl.program_id(1)
    i = I - 1 - j

    @pl.when(j == 0)
    def _init():
        gsums_scr[:] = jnp.zeros_like(gsums_scr)
        gchan_ref[:] = jnp.zeros_like(gchan_ref)
        gchanq_ref[:] = jnp.zeros_like(gchanq_ref)

    gq_ref = gchanq_ref if meta.qms_qbit is not None else gchan_ref
    chan = chan_ref[:]
    chan_out = chanq_ref[:] if meta.qms_qbit is not None else chan
    g_out = gout_ref[0]
    bt_k = g_out.shape[1]
    rslot = jnp.maximum(i - 1, 0)

    if meta.has_vn_w:
        vnw_flat = _w_vn(vnw_ref, meta)
        xa = chan * vnw_flat
        if meta.qms_qbit is not None:
            xa_q = _quantize(xa, meta.qms_qbit)
            lo_q, hi_q, _ = _QMS_TABLE[meta.qms_qbit]
            mask_xa = _clip_grad_mask(xa, lo_q, hi_q)
        else:
            xa_q = xa
            mask_xa = jnp.ones_like(xa)
    else:
        xa_q = chan_out

    # ---- pass 1: sums entering iteration i, in the forward's edge order ----
    acc1 = [None] * meta.N
    for base, d, nc in meta.chunks:
        nrows = d * nc * meta.Zp
        ne, e0 = d * nc, base // meta.Zp

        @pl.when(i != 0)
        def _read1(base=base, nrows=nrows, rslot=rslot):
            cp = pltpu.make_async_copy(
                store_ref.at[rslot, bi, pl.ds(base, nrows), :],
                rbounce.at[pl.ds(0, nrows), :], rsem,
            )
            cp.start()
            cp.wait()

        msg_cls = jnp.where(i == 0, 0.0, rbounce[pl.ds(0, nrows), :])
        for k in range(ne):
            e = e0 + k
            nn = meta.vn_of_edge[e]
            c = _roll_z(msg_cls[k * meta.Zp : (k + 1) * meta.Zp], -meta.shift_of_edge[e], meta)
            acc1[nn] = c if acc1[nn] is None else acc1[nn] + c
    zero = jnp.zeros((meta.Zp, bt_k), jnp.float32)
    sums_prev = jnp.concatenate([a if a is not None else zero for a in acc1], axis=0)

    if meta.has_ucn:
        prev_pre = prevout_ref[0]  # pre-clip APP of iteration i-1 (garbage at i=0)
        prev_app = jnp.clip(prev_pre, meta.clip_lo, meta.clip_hi)
        app = jnp.where(i == 0, xa_q, prev_app)
        dsign = jnp.where(app < 0, -1.0, 1.0)

    vn_total = xa_q + sums_prev
    lo_m, hi_m = _msg_range(meta)
    g_sums_total = gsums_scr[:] + g_out

    # ---- pass 2: per-chunk adjoint ----
    acc = [None] * meta.N
    g_cnw_parts, g_ucnw_parts = [], []
    for base, d, nc in meta.chunks:
        nrows = d * nc * meta.Zp
        ne, e0 = d * nc, base // meta.Zp

        @pl.when(i != 0)
        def _read2(base=base, nrows=nrows, rslot=rslot):
            cp = pltpu.make_async_copy(
                store_ref.at[rslot, bi, pl.ds(base, nrows), :],
                rbounce.at[pl.ds(0, nrows), :], rsem,
            )
            cp.start()
            cp.wait()

        msg_prev_cls = jnp.where(i == 0, 0.0, rbounce[pl.ds(0, nrows), :])
        routed_cls = _route_e_rows(vn_total, None, meta, routing_dtype, e0, e0 + ne)
        v2c_pre = routed_cls - msg_prev_cls
        mask_cls = _clip_grad_mask(v2c_pre, lo_m, hi_m)
        v2c_cls = _clip_or_quant(v2c_pre, meta)

        @pl.when(j != 0)
        def _readg(base=base, nrows=nrows):
            cp = pltpu.make_async_copy(
                gmsg_ref.at[bi, pl.ds(base, nrows), :],
                gbounce.at[pl.ds(0, nrows), :], gsem,
            )
            cp.start()
            cp.wait()

        g_msg_cls = jnp.where(j == 0, 0.0, gbounce[pl.ds(0, nrows), :]) + _route_e_rows(
            g_sums_total, None, meta, routing_dtype, e0, e0 + ne, grad=True
        )

        if meta.has_ucn:
            s_route = _route_e_rows(dsign, None, meta, routing_dtype, e0, e0 + ne)
            ucn_cls = _ucn_mask_one(jnp.where(s_route < 0, -1.0, 1.0), d, nc, meta)
            scn_cls = 1.0 - ucn_cls

        def g_extrmin_fn(c2v, base=base, nrows=nrows, ne=ne, g_msg_cls=g_msg_cls):
            mag = jnp.abs(c2v)
            if meta.has_ucn:
                w_eff = (
                    _w_rows(cnw_ref, meta, base, nrows, bt_k) * scn_cls
                    + _w_rows(ucnw_ref, meta, base, nrows, bt_k) * ucn_cls
                )
            elif meta.has_cn_w:
                w_eff = _w_rows(cnw_ref, meta, base, nrows, bt_k)
            else:
                w_eff = jnp.ones_like(mag)
            wm_pre = mag * w_eff
            wm_relu = jnp.maximum(wm_pre, 0.0)
            s_nz = jnp.sign(c2v)
            g_wm_q = g_msg_cls * s_nz
            g_wm_relu = g_wm_q * _clip_grad_mask(wm_relu, lo_m, hi_m)
            g_wm_pre = g_wm_relu * _relu_grad_mask(wm_pre)
            g_w = g_wm_pre * mag
            if meta.has_ucn:
                g_cnw = _g_edge_w(g_w * scn_cls, meta, ne)
                g_ucnw = _g_edge_w(g_w * ucn_cls, meta, ne)
            elif meta.has_cn_w:
                g_cnw = _g_edge_w(g_w, meta, ne)
                g_ucnw = None
            else:
                g_cnw = None
                g_ucnw = None
            g_extrmin = g_wm_pre * w_eff
            return g_extrmin, g_cnw, g_ucnw

        cn_fwd_bwd = (_cn_sumproduct_fwd_bwd_one if meta.sum_product
                      else _cn_minsum_fwd_bwd_one)
        g_v2c_cls, g_cnw_p, g_ucnw_p = cn_fwd_bwd(
            v2c_cls, d, nc, meta, g_extrmin_fn
        )
        g_cnw_parts.append(g_cnw_p)
        g_ucnw_parts.append(g_ucnw_p)

        g_v2c_pre = g_v2c_cls * mask_cls
        # v2c_pre = routed - msg_prev: message-carry cotangent for step i-1
        @pl.when(j != I - 1)
        def _writeg(g_v2c_pre=g_v2c_pre, base=base, nrows=nrows):
            wbounce[pl.ds(0, nrows), :] = -g_v2c_pre
            cp = pltpu.make_async_copy(
                wbounce.at[pl.ds(0, nrows), :],
                gmsg_ref.at[bi, pl.ds(base, nrows), :], wsem,
            )
            cp.start()
            cp.wait()

        for k in range(ne):
            e = e0 + k
            nn = meta.vn_of_edge[e]
            c = _roll_z(g_v2c_pre[k * meta.Zp : (k + 1) * meta.Zp], -meta.shift_of_edge[e], meta)
            acc[nn] = c if acc[nn] is None else acc[nn] + c

    g_T = jnp.concatenate([a if a is not None else zero for a in acc], axis=0)
    gsums_scr[:] = g_T

    g_cnw_i = None if g_cnw_parts[0] is None else jnp.concatenate(g_cnw_parts, axis=0)
    g_ucnw_i = None if g_ucnw_parts[0] is None else jnp.concatenate(g_ucnw_parts, axis=0)

    gq_ref[:] += g_out  # out_pre_i = chanq + sums_i

    def _pad_edge_g(g):
        if meta.w_layout == "col":
            return g
        return jnp.pad(g, ((0, meta.Ep8 - meta.E), (0, 0)))

    if meta.has_vn_w:
        g_xa = g_T * mask_xa
        if meta.w_layout == "col":
            gvnw_ref[0, 0] = jnp.sum(g_xa * chan, axis=1, keepdims=True)
        else:
            g_vn = (g_xa * chan).reshape(meta.N, meta.Zp, g_xa.shape[1]).sum(axis=1)
            gvnw_ref[0, 0] = jnp.pad(g_vn, ((0, meta.Np8 - meta.N), (0, 0)))
        gchan_ref[:] += g_xa * vnw_flat
    else:
        gq_ref[:] += g_T  # xa_q IS chanq
        gvnw_ref[0, 0] = jnp.zeros_like(gvnw_ref[0, 0])
    gcnw_ref[0, 0] = (
        _pad_edge_g(g_cnw_i) if g_cnw_i is not None
        else jnp.zeros_like(gcnw_ref[0, 0])
    )
    gucnw_ref[0, 0] = (
        _pad_edge_g(g_ucnw_i) if g_ucnw_i is not None
        else jnp.zeros_like(gucnw_ref[0, 0])
    )


@functools.partial(
    jax.jit, static_argnames=("meta", "bt", "routing_dtype", "interpret")
)
def _bwd_run_hbm(chan, chanq, cnw, vnw, ucnw, store, outs, g_outs,
                 meta: _TrainMeta, bt: int, routing_dtype, interpret):
    NZp, B = chan.shape
    EZp = meta.E * meta.Zp
    I = meta.n_iterations
    nb = B // bt
    kernel = functools.partial(_bwd_kernel_hbm, meta, routing_dtype)
    rev = lambda j: I - 1 - j  # noqa: E731
    chanq_spec = (
        pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM)
        if meta.qms_qbit is not None
        else pl.BlockSpec(chanq.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM)
    )
    res = pl.pallas_call(
        kernel,
        grid=(nb, I),
        in_specs=[
            pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM),
            chanq_spec,
            pl.BlockSpec((1,) + cnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + vnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + ucnw.shape[1:], lambda bi, j: (rev(j), 0, 0), memory_space=pltpu.VMEM),
            # pre-clip APP of iteration i-1, consumed only by the UCN mask —
            # without UCN ride a token window so the stream costs no VMEM
            (
                pl.BlockSpec(
                    (1, NZp, bt),
                    lambda bi, j: (jnp.maximum(rev(j) - 1, 0), 0, bi),
                    memory_space=pltpu.VMEM,
                )
                if meta.has_ucn
                else pl.BlockSpec((1, 8, 128), lambda bi, j: (0, 0, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((1, NZp, bt), lambda bi, j: (rev(j), 0, bi), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # store
        ],
        out_specs=[
            pl.BlockSpec((1, 1) + cnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + vnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + ucnw.shape[1:], lambda bi, j: (bi, rev(j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((NZp, bt), lambda bi, j: (0, bi), memory_space=pltpu.VMEM)
                if meta.qms_qbit is not None
                else pl.BlockSpec(chanq.shape, lambda bi, j: (0, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # adjoint message carry
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, I) + cnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((nb, I) + vnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((nb, I) + ucnw.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct((NZp, B), jnp.float32),
            jax.ShapeDtypeStruct(
                (NZp, B) if meta.qms_qbit is not None else chanq.shape, jnp.float32
            ),
            jax.ShapeDtypeStruct((nb, EZp, bt), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NZp, bt), jnp.float32),
            pltpu.VMEM((meta.chunk_rows, bt), jnp.float32),
            pltpu.VMEM((meta.chunk_rows, bt), jnp.float32),
            pltpu.VMEM((meta.chunk_rows, bt), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=meta.vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(chan, chanq, cnw, vnw, ucnw, outs, g_outs, store)
    g_cnw_b, g_vnw_b, g_ucnw_b, g_chan, g_chanq, _ = res
    return (
        g_cnw_b.sum(axis=0),
        g_vnw_b.sum(axis=0),
        g_ucnw_b.sum(axis=0),
        g_chan,
        g_chanq,
    )


# ---------------------------------------------------------------------------
# Host-side wrapper with custom VJP
# ---------------------------------------------------------------------------
class FusedTrainDecoder:
    """Differentiable fused decoder: ``apply(cn_w, ucn_w, vn_w, chan)`` returns
    the per-iteration APP [I, B, N*Z] with gradients flowing through the
    Pallas forward/backward kernels.

    Also serves as the general streaming forward (``decode`` /
    ``apply(..., with_grad=False)``): arbitrary Z, degree-class compiled,
    per-iteration outputs at full batch tiles.
    """

    def __init__(
        self,
        graph: TannerGraph,
        n_iterations: int,
        clip: tuple[float, float] = (-20.0, 20.0),
        qms_qbit: Optional[int] = None,
        has_cn_w: bool = True,
        has_vn_w: bool = False,
        has_ucn: bool = False,
        sum_product: bool = False,
        store_msgs: bool = True,  # False = streaming decode only (no VJP)
        routing: str = "auto",  # "roll" (VPU rotates) | "matmul" (one-hot MXU)
        stream_outputs: Optional[bool] = None,  # False = final-APP-only decode
        bt: Optional[int] = None,
        routing_dtype=jnp.bfloat16,
        int8_routing: Optional[bool] = None,
        interpret: bool = False,
        # "vmem" = message state resident in VMEM scratch (fast path);
        # "hbm" = stream it through HBM per degree-class chunk (big codes);
        # "auto" = vmem while it fits, else hbm
        store_space: str = "auto",
        # decode-only: also emit a per-word syndrome-satisfied flag (apply
        # then returns (outs, ok)); see _TrainMeta.emit_syndrome
        emit_syndrome: bool = False,
        # decode-only, all-zero campaigns: emit ONLY per-word stats — apply
        # returns (ok [B], bit_errors [B], frame_error [B]) and the APP never
        # leaves VMEM; see _TrainMeta.emit_stats
        emit_stats: bool = False,
        # stats-only campaigns: sample the AWGN channel inside the kernel
        # (hardware PRNG + Box-Muller) — use apply_sampled(seed, sigma,
        # batch); see _TrainMeta.sample_channel
        sample_channel: bool = False,
        # with sample_channel: also write the sampled llr to HBM (the
        # early-exit engine re-decodes escalations from it)
        emit_chan: bool = False,
        # with sample_channel: decode words at caller-given ORIGINAL batch
        # indices, re-sampling their channel from the counter stream of a
        # phase-1 sampler whose tile width was this value (power of two;
        # 0 = off) — use apply_sampled_at(seed, sigma, widx)
        sample_at_idx: int = 0,
        # Mosaic scoped-VMEM budget override (MB); None = 121 for
        # VMEM-resident kernels (calibrated sweet spot), 112 for
        # HBM-streamed ones (the compiler schedules TO the budget then
        # overshoots — measured +8.2 MB at BG1 scale, which blew the 128 MB
        # physical cap from a 121 MB budget); see _TrainMeta
        vmem_limit_mb: Optional[int] = None,
    ):
        if routing == "auto":
            # roll measured faster on both shipped codes (decode +17-29%,
            # train +27%, benchmarks/measure_r2.json) AND in the E>512
            # regime (round 5, benchmarks/bg1_routing_r4.json: at E=580,
            # decode 2.27x and train 1.42x over matmul, with FASTER
            # compiles) — the r4 E<=512 threshold was speculative.  matmul
            # remains only past the capacity gate's compile-practicality
            # bound (the per-edge unroll dominates builds beyond ~1024
            # edges).
            routing = "roll" if graph.E <= 1024 else "matmul"
        if routing not in ("matmul", "roll"):
            raise ValueError(f"unknown routing {routing!r}")
        if routing == "roll":
            int8_routing = False  # rolls are exact f32; no matmuls to quantize
        if stream_outputs is None:
            stream_outputs = store_msgs
        if store_msgs and not stream_outputs:
            raise ValueError("training (store_msgs) needs the full output stream")
        if qms_qbit is not None and qms_qbit not in _QMS_TABLE:
            raise ValueError(f"unsupported qms_qbit {qms_qbit}")
        if int8_routing is None:
            int8_routing = qms_qbit is not None and not interpret
        if int8_routing and qms_qbit is None:
            raise ValueError("int8 routing needs QMS quantization")
        if has_ucn and not has_cn_w:
            raise ValueError("UCN weighting requires CN weights")
        if sum_product and qms_qbit is not None:
            raise ValueError("SP and QMS are mutually exclusive decoder types")
        if emit_syndrome and (store_msgs or stream_outputs):
            raise ValueError("emit_syndrome is a final-APP decode epilogue; "
                             "use store_msgs=False, stream_outputs=False")
        if emit_stats and (store_msgs or stream_outputs or emit_syndrome):
            raise ValueError("emit_stats is a stats-only decode mode; use "
                             "store_msgs=False, stream_outputs=False and not "
                             "emit_syndrome (stats row 0 IS the syndrome)")
        if sample_channel and not emit_stats:
            raise ValueError("sample_channel is a stats-only campaign mode "
                             "(all-zero words); set emit_stats=True")
        if emit_chan and not sample_channel:
            raise ValueError("emit_chan re-exports the IN-KERNEL sampled llr; "
                             "set sample_channel=True")
        if sample_at_idx:
            if not sample_channel:
                raise ValueError("sample_at_idx re-samples IN KERNEL; set "
                                 "sample_channel=True")
            if emit_chan:
                raise ValueError("sample_at_idx and emit_chan are exclusive "
                                 "(index mode exists to avoid the llr export)")
            if sample_at_idx & (sample_at_idx - 1):
                raise ValueError("sample_at_idx must be the phase-1 batch "
                                 "tile width, a power of two")
        self.graph = graph
        edge_perm, deg_classes, R = build_layout(
            graph, need_routing_operand=routing == "matmul")
        self.edge_perm = edge_perm  # host numpy: closed over by outer jits
        Z, Zp = graph.Z, _round8(graph.Z)
        NZ, NZp = graph.N * Z, graph.N * Zp
        exact_matmul = routing == "matmul" and not int8_routing
        if exact_matmul:
            routing_dtype = jnp.bfloat16  # split-3 operand storage (0/1 exact)
        # weight-stream layout: the column layout's [EZp, 1] windows lane-pad
        # every row to 128 lanes; beyond ~8 MB of windows switch to the
        # replicated-lane layout (tiny windows, ~25% slower weighting)
        n_streams = int(has_cn_w or has_ucn) + int(has_ucn)
        col_bytes = 2 * 512 * (n_streams * graph.E * Zp + int(has_vn_w) * graph.N * Zp)
        w_layout = "col" if col_bytes <= 8 * 1024 * 1024 else "lane"
        self.meta = _TrainMeta(
            M=graph.M, N=graph.N, Z=Z, Zp=Zp, E=graph.E, NZ=NZ, NZp=NZp,
            Ep8=_round8(graph.E), Np8=_round8(graph.N),
            deg_classes=deg_classes, n_iterations=n_iterations,
            clip_lo=float(clip[0]), clip_hi=float(clip[1]),
            qms_qbit=qms_qbit, has_cn_w=has_cn_w, has_vn_w=has_vn_w,
            has_ucn=has_ucn, int8_routing=int8_routing, store_msgs=store_msgs,
            sum_product=sum_product, routing=routing, exact_matmul=exact_matmul,
            w_layout=w_layout,
            vn_of_edge=tuple(int(graph.vn_of_edge[e]) for e in edge_perm),
            shift_of_edge=tuple(int(graph.shift_of_edge[e]) for e in edge_perm),
            stream_outputs=stream_outputs,
            emit_syndrome=emit_syndrome,
            emit_stats=emit_stats,
            sample_channel=sample_channel,
            emit_chan=emit_chan,
            sample_at_idx=int(sample_at_idx),
        )
        operand_bytes = 0
        if routing == "matmul":
            osize = 1 if int8_routing else jnp.dtype(routing_dtype).itemsize
            operand_bytes = 2 * (graph.N * Zp) * (graph.E * Zp) * osize
        # the estimate excludes Mosaic's in-kernel liveness (per-class CN
        # temporaries and scheduling-extended lifetimes), which is much
        # heavier in the backward kernel — hence the tighter training budget.
        # Round-3 hardware calibration (synthetic BG1, bt=128): estimated
        # 59 MB (Z=64, E*Zp=23.4k) compiles and runs; estimated 87 MB (Z=96)
        # blows physical VMEM with ~100 MB of register spills — the backward
        # register allocator does not free per-class temporaries.
        limit = (70 if store_msgs else 100) * 1024 * 1024
        auto_bt = bt is None
        if auto_bt:
            # round-3 hardware sweep (measure_r3): small tiles pipeline the
            # grid better — decode peaks at bt=128 (wman 14.2M vs 11.8M at
            # the round-2 default 512) / 256 for larger codes; training at
            # bt=256 on both shipped codes
            if store_msgs:
                bt = 256
            else:
                bt = 128 if graph.E * Zp <= 2500 else 256
            while bt > 128 and _vmem_bytes(self.meta, bt, operand_bytes) > limit:
                bt //= 2
        if store_space not in ("auto", "vmem", "hbm"):
            raise ValueError(f"unknown store_space {store_space!r}")
        if store_space == "auto":
            store_space = (
                "hbm" if _vmem_bytes(self.meta, bt, operand_bytes) > limit else "vmem"
            )
        if store_space == "hbm":
            if sample_channel:
                raise ValueError("sample_channel is VMEM-resident only "
                                 "(big codes keep the XLA channel sampler)")
            # big-code mode: messages stream HBM<->VMEM per degree-class chunk
            if routing != "roll":
                raise ValueError(
                    "store_space='hbm' requires roll routing (one-hot matmul "
                    "operands at this scale dwarf VMEM)"
                )
            hbm_limit = 100 * 1024 * 1024
            while True:
                # chunk height targets ~2 MB of bounce at this tile; at least
                # one whole check per chunk
                max_rows = max((2 * 1024 * 1024) // (4 * bt), max(
                    d for d, _ in deg_classes) * Zp)
                chunks = _build_chunks(deg_classes, Zp, max_rows)
                self.meta = dataclasses.replace(
                    self.meta, hbm_store=True, chunks=chunks,
                    chunk_rows=max(d * nc * Zp for _, d, nc in chunks),
                )
                # floor at the 128-lane tile: sub-128 bt lane-pads every
                # window back to 128 lanes, so descending further cannot
                # shrink VMEM (round-5 fix; the lane-honest estimate admits
                # the full Z=384 BG1 lift at bt=128 for MS decode)
                if _vmem_bytes_hbm(self.meta, bt) <= hbm_limit or bt <= 128:
                    break
                if not auto_bt:
                    break
                bt //= 2
            if _vmem_bytes_hbm(self.meta, bt) > hbm_limit:
                raise ValueError(
                    f"code too large even for HBM-streamed messages (NZp = "
                    f"{NZp}, estimated {_vmem_bytes_hbm(self.meta, bt) >> 20}MB "
                    f"at bt={bt}); use the XLA paths (ops/flat.py)"
                )
        elif _vmem_bytes(self.meta, bt, operand_bytes) > limit:
            raise ValueError(
                f"code too large for VMEM-resident messages (E*Zp = {graph.E * Zp}, "
                f"estimated {_vmem_bytes(self.meta, bt, operand_bytes) >> 20}MB at "
                f"bt={bt}); retry with store_space='hbm' (chunk-streamed "
                "messages) or the XLA paths (ops/flat.py)"
            )
        if vmem_limit_mb is None:
            # HBM-streamed DECODE kernels schedule to the budget then
            # overshoot (+8.2 MB measured at BG1 scale): leave headroom.
            # Training HBM kernels keep 121 (hardware-validated at Z<=256).
            vmem_limit_mb = 112 if (self.meta.hbm_store and not store_msgs) else 121
        self.meta = dataclasses.replace(self.meta, vmem_limit_mb=vmem_limit_mb)
        self.bt = bt
        self.routing_dtype = routing_dtype
        self.interpret = interpret
        if routing == "roll":
            # no routing operands; tiny placeholders keep the kernel signature
            dummy = np.zeros((8, 128), jnp.dtype(routing_dtype))
            self._r = self._rt = dummy
        else:
            operand_dtype = jnp.int8 if int8_routing else routing_dtype
            # host numpy: device-resident constants would be fetched back
            # device->host at every jit lowering that closes over them
            self._r = R.astype(jnp.dtype(operand_dtype))
            self._rt = np.ascontiguousarray(R.T).astype(jnp.dtype(operand_dtype))

        self._vjp = jax.custom_vjp(self._primal)
        self._vjp.defvjp(self._vjp_fwd, self._vjp_bwd)

    @staticmethod
    def from_decoder(decoder, **kw) -> "FusedTrainDecoder":
        """Static-config construction from a BoostedNeuralDecoder (the params
        arrive per call via ``apply`` so gradients flow)."""
        from ...structs import Convention, DecoderType, SharingMode

        cfg = decoder.config
        if cfg.convention == Convention.REFERENCE:
            raise ValueError("fused training implements the STANDARD convention")
        return FusedTrainDecoder(
            decoder.graph,
            n_iterations=cfg.n_iterations,
            clip=(cfg.allowed_llr_range.start, cfg.allowed_llr_range.end),
            qms_qbit=cfg.qms_qbit if cfg.decoder_type == DecoderType.QMS else None,
            has_cn_w=cfg.sharing.cn != SharingMode.NONE,
            has_vn_w=cfg.sharing.vn != SharingMode.NONE,
            has_ucn=cfg.sharing.ucn != SharingMode.NONE,
            sum_product=cfg.decoder_type == DecoderType.SP,
            **kw,
        )

    # -- kernel-layout packing (differentiable, outside the custom VJP) -----
    def _pack_edge_w(self, w):  # [I, E] -> col [I, EZp, 1] | lane [I, Ep8, bt]
        m = self.meta
        w = w[:, self.edge_perm]
        if m.w_layout == "col":
            w = jnp.broadcast_to(w[:, :, None], (m.n_iterations, m.E, m.Zp))
            return w.reshape(m.n_iterations, m.E * m.Zp, 1)
        w = jnp.pad(w, ((0, 0), (0, m.Ep8 - m.E)))
        return jnp.broadcast_to(w[:, :, None], (m.n_iterations, m.Ep8, self.bt))

    def _pack_vn_w(self, w):  # [I, N] -> col [I, NZp, 1] | lane [I, Np8, bt]
        m = self.meta
        if m.w_layout == "col":
            w3 = jnp.broadcast_to(w[:, :, None], (m.n_iterations, m.N, m.Z))
            w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, m.Zp - m.Z)))
            return w3.reshape(m.n_iterations, m.NZp)[:, :, None]
        w = jnp.pad(w, ((0, 0), (0, m.Np8 - m.N)))
        return jnp.broadcast_to(w[:, :, None], (m.n_iterations, m.Np8, self.bt))

    def _fwd_any(self, cnw, vnw, ucnw, chan, chanq, seed=None, sigma=None,
                 widx=None):
        """(outs, store, syn, sampled_chan) from whichever kernel fits."""
        if self.meta.hbm_store:
            outs, store, syn = _fwd_run_hbm(
                chan, chanq, cnw, vnw, ucnw,
                self.meta, self.bt, self.routing_dtype, self.interpret,
            )
            return outs, store, syn, None
        return _fwd_run(
            chan, chanq, self._rt, self._r, cnw, vnw, ucnw,
            self.meta, self.bt, self.routing_dtype, self.interpret,
            seed=seed, sigma=sigma, widx=widx,
        )

    def _primal(self, cnw, vnw, ucnw, chan, chanq):
        outs, _, _, _ = self._fwd_any(cnw, vnw, ucnw, chan, chanq)
        return outs

    def _vjp_fwd(self, cnw, vnw, ucnw, chan, chanq):
        outs, store, _, _ = self._fwd_any(cnw, vnw, ucnw, chan, chanq)
        return outs, (cnw, vnw, ucnw, chan, chanq, store, outs)

    def _vjp_bwd(self, res, g_outs):
        cnw, vnw, ucnw, chan, chanq, store, outs = res
        if store is None:
            raise ValueError(
                "backward requires store_msgs=True (streaming decode mode has "
                "no message checkpoints)"
            )
        if self.meta.hbm_store:
            g_cnw, g_vnw, g_ucnw, g_chan, g_chanq = _bwd_run_hbm(
                chan, chanq, cnw, vnw, ucnw, store, outs, g_outs,
                self.meta, self.bt, self.routing_dtype, self.interpret,
            )
        else:
            g_cnw, g_vnw, g_ucnw, g_chan, g_chanq = _bwd_run(
                chan, chanq, self._rt, self._r, cnw, vnw, ucnw, store, outs, g_outs,
                self.meta, self.bt, self.routing_dtype, self.interpret,
            )
        return g_cnw, g_vnw, g_ucnw, g_chan, g_chanq

    # -- public API ---------------------------------------------------------
    def apply(self, cn_w, ucn_w, vn_w, chan_llr):
        """cn_w/ucn_w [I, E] or None, vn_w [I, N] or None (original edge
        order, as produced by BoostedNeuralDecoder._expanded_weights);
        chan_llr [B, N, Z] or [B, N*Z].  Returns per-iteration APP
        [I, B, N*Z], differentiable w.r.t. weights and channel."""
        m = self.meta
        B = chan_llr.shape[0]
        x = chan_llr.reshape(B, m.N, m.Z).astype(jnp.float32)
        x = jnp.pad(x, ((0, (-B) % self.bt), (0, 0), (0, m.Zp - m.Z)))
        chan = x.reshape(x.shape[0], m.NZp).T  # [NZp, Bp], per-VN Zp layout
        return self._apply_from_packed(cn_w, ucn_w, vn_w, chan, B)

    def apply_packed(self, cn_w, ucn_w, vn_w, chan_packed):
        """Stats-only decode from an ALREADY-PACKED ``[NZp, B']`` channel
        buffer (the raw ``emit_chan`` kernel layout, per-VN Zp rows).  The
        early-exit engine column-gathers compacted escalations out of the
        phase-1 buffer and re-decodes them here WITHOUT the
        [NZp,B] -> [B,N,Z] -> [NZp,K] transpose round trip (a 2x full-batch
        HBM pass at 1M-word batches — see benchmarks/mfu_r4.json
        ee_step_trace)."""
        m = self.meta
        if not m.emit_stats:
            raise ValueError("apply_packed is a stats-only path "
                             "(construct with emit_stats=True)")
        B = chan_packed.shape[1]
        chan = jnp.pad(chan_packed.astype(jnp.float32),
                       ((0, 0), (0, (-B) % self.bt)))
        return self._apply_from_packed(cn_w, ucn_w, vn_w, chan, B)

    def _apply_from_packed(self, cn_w, ucn_w, vn_w, chan, B):
        m = self.meta
        # MS: chanq IS chan — a tiny placeholder rides instead of a second
        # [NZp, B] stream (at BG1 scale that window decided VMEM fit); the
        # channel-quantizer STE stays differentiated outside the kernel
        chanq = (
            qms_quantize_ste(chan, m.qms_qbit)
            if m.qms_qbit is not None
            else jnp.zeros((8, 128), jnp.float32)
        )
        # absent weight streams ride as small all-ones placeholders
        dummy = jnp.ones(
            (m.n_iterations, 8, 1 if m.w_layout == "col" else 128), jnp.float32
        )
        ones_e = jnp.ones((m.n_iterations, m.E), jnp.float32)
        ones_n = jnp.ones((m.n_iterations, m.N), jnp.float32)
        cnw = (
            self._pack_edge_w(cn_w if cn_w is not None else ones_e)
            if (m.has_cn_w or m.has_ucn) else dummy
        )
        ucnw = (
            self._pack_edge_w(ucn_w if ucn_w is not None else ones_e)
            if m.has_ucn else dummy
        )
        vnw = (
            self._pack_vn_w(vn_w if vn_w is not None else ones_n)
            if m.has_vn_w else dummy
        )
        syn = None
        if m.stream_outputs:
            outs_pre = self._vjp(cnw, vnw, ucnw, chan, chanq)
        else:
            outs_pre, _, syn, _ = self._fwd_any(cnw, vnw, ucnw, chan, chanq)
        if m.emit_stats:
            stats = outs_pre[0]  # [8, Bp]
            return stats[0, :B] > 0.5, stats[1, :B], stats[2, :B] > 0.5
        outs = jnp.clip(outs_pre, m.clip_lo, m.clip_hi)
        return self._unpack_outs(outs, syn, B)

    def _unpack_outs(self, outs, syn, B):
        m = self.meta
        I = outs.shape[0]  # 1 when stream_outputs=False
        o = outs.reshape(I, m.N, m.Zp, outs.shape[2])[:, :, : m.Z, :B]
        o = jnp.transpose(o, (0, 3, 1, 2)).reshape(I, B, m.NZ)
        if m.emit_syndrome:
            return o, syn[0, :B] > 0.5
        return o

    def apply_sampled(self, cn_w, ucn_w, vn_w, seed, sigma, batch: int,
                      raw_chan: bool = False):
        """Stats-only decode with IN-KERNEL channel sampling (all-zero
        words): no llr ever crosses XLA<->kernel.  ``seed`` int32 scalar
        (vary per batch), ``sigma`` f32 noise std, ``batch`` static.

        Returns (ok [B] bool, bit_errors [B], frame_error [B] bool); with
        emit_chan additionally the sampled llr — as [B, N, Z] by default,
        or (raw_chan=True) the raw packed [NZp, Bp] buffer for
        ``apply_packed`` (skips a 2x full-batch HBM transpose pass)."""
        m = self.meta
        if not m.sample_channel:
            raise ValueError("construct with sample_channel=True")
        Bp = batch + (-batch) % self.bt
        dummy_chan = jnp.zeros((8, Bp), jnp.float32)
        dummy_q = jnp.zeros((8, 128), jnp.float32)
        dummy = jnp.ones(
            (m.n_iterations, 8, 1 if m.w_layout == "col" else 128), jnp.float32
        )
        ones_e = jnp.ones((m.n_iterations, m.E), jnp.float32)
        ones_n = jnp.ones((m.n_iterations, m.N), jnp.float32)
        cnw = (
            self._pack_edge_w(cn_w if cn_w is not None else ones_e)
            if (m.has_cn_w or m.has_ucn) else dummy
        )
        ucnw = (
            self._pack_edge_w(ucn_w if ucn_w is not None else ones_e)
            if m.has_ucn else dummy
        )
        vnw = (
            self._pack_vn_w(vn_w if vn_w is not None else ones_n)
            if m.has_vn_w else dummy
        )
        outs, _, _, chan = self._fwd_any(
            cnw, vnw, ucnw, dummy_chan, dummy_q, seed=seed, sigma=sigma
        )
        stats = outs[0]
        res = (stats[0, :batch] > 0.5, stats[1, :batch], stats[2, :batch] > 0.5)
        if not m.emit_chan:
            return res
        if raw_chan:
            return res, chan
        llr = chan.T[:batch].reshape(batch, m.N, m.Zp)[:, :, : m.Z]
        return res, llr

    def apply_sampled_at(self, cn_w, ucn_w, vn_w, seed, sigma, widx):
        """Stats-only decode of the words at ORIGINAL batch indices ``widx``
        [K] int32, re-sampling their channel IN KERNEL from the same
        (seed, index) counter stream as a phase-1 sampler (construct with
        sample_at_idx=<phase-1 bt>).  The early-exit engine escalates
        compacted failures this way: the sampled llr never touches HBM in
        either phase."""
        m = self.meta
        if not m.sample_at_idx:
            raise ValueError("construct with sample_at_idx=<phase-1 bt>")
        K = widx.shape[0]
        Kp = K + (-K) % self.bt
        widx_p = jnp.pad(widx.astype(jnp.int32), (0, Kp - K))
        dummy_chan = jnp.zeros((8, Kp), jnp.float32)
        dummy_q = jnp.zeros((8, 128), jnp.float32)
        dummy = jnp.ones(
            (m.n_iterations, 8, 1 if m.w_layout == "col" else 128), jnp.float32
        )
        ones_e = jnp.ones((m.n_iterations, m.E), jnp.float32)
        ones_n = jnp.ones((m.n_iterations, m.N), jnp.float32)
        cnw = (
            self._pack_edge_w(cn_w if cn_w is not None else ones_e)
            if (m.has_cn_w or m.has_ucn) else dummy
        )
        ucnw = (
            self._pack_edge_w(ucn_w if ucn_w is not None else ones_e)
            if m.has_ucn else dummy
        )
        vnw = (
            self._pack_vn_w(vn_w if vn_w is not None else ones_n)
            if m.has_vn_w else dummy
        )
        outs, _, _, _ = self._fwd_any(
            cnw, vnw, ucnw, dummy_chan, dummy_q, seed=seed, sigma=sigma,
            widx=widx_p,
        )
        stats = outs[0]
        return stats[0, :K] > 0.5, stats[1, :K], stats[2, :K] > 0.5
