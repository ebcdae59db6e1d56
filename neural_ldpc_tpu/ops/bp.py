"""Core belief-propagation message-update primitives on edge tables.

This is the TPU-native replacement for the reference's dense formulation
(src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:376-429): the
[B, Z, E, E] tiled check-node update becomes a padded per-check masked
reduction (O(E * max_deg) work), the (EZ) x (EZ) lifting matmuls become
per-edge cyclic-shift gathers, and the one-hot routing matmuls become index
gathers / padded sums.  All functions are pure, shape-static, and jit/scan
friendly; message tensors are laid out [B, Z, E] with E in CN-order (edges
grouped by check).

Two numerical modes:
  * standard: clean textbook updates (sign of 0 treated as +).
  * parity (``parity_with_reference=True`` on ``GraphArrays``): reproduce the
    reference bit-for-bit — the +1e-4 zero-avoidance before the CN min, the
    -1e-4 removal after it (BoostedNeuralLDPCDecoder.py:391-393,416), and the
    per-check (-1)^deg sign factor that the reference's tile formulation
    carries (net effect of :417-423, see SURVEY.md §2.4 and structs.Convention).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.tanner import TannerGraph

_BIG = 10000.0  # masking magnitude for min-reductions (reference :411-414)
_ZERO_EPS = 1e-4  # zero-avoidance epsilon (reference :391-393)
_SP_EPS = 1e-7  # atanh clamp (reference :406-408)


@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Trace-time constant views of a TannerGraph's index tables.

    Kept as HOST numpy arrays: jit lowering embeds closed-over constants in
    the MLIR module, and a device-resident constant would be fetched back
    device->host at every trace — tens of seconds over a remote-TPU tunnel.
    """

    M: int
    N: int
    Z: int
    E: int
    max_cn_degree: int
    max_vn_degree: int

    cn_of_edge: jnp.ndarray  # [E] int32
    vn_of_edge: jnp.ndarray  # [E] int32
    slot_of_edge: jnp.ndarray  # [E] int32
    cn_edges_flat: jnp.ndarray  # [M * Dc] int32 (E = pad sentinel)
    vn_edges_flat: jnp.ndarray  # [N * Dv] int32 (E = pad sentinel)
    z_roll_in: jnp.ndarray  # [1, Z, E] int32
    z_roll_out: jnp.ndarray  # [1, Z, E] int32
    deg_sign: jnp.ndarray  # [E] float32, (-1)^deg of the edge's check (parity mode)
    cn_deg_sign: jnp.ndarray  # [M] float32

    @staticmethod
    def from_graph(g: TannerGraph) -> "GraphArrays":
        deg_sign_cn = np.where(g.cn_degree % 2 == 0, 1.0, -1.0).astype(np.float32)
        return GraphArrays(
            M=g.M, N=g.N, Z=g.Z, E=g.E,
            max_cn_degree=g.max_cn_degree, max_vn_degree=g.max_vn_degree,
            cn_of_edge=np.asarray(g.cn_of_edge),
            vn_of_edge=np.asarray(g.vn_of_edge),
            slot_of_edge=np.asarray(g.slot_of_edge),
            cn_edges_flat=np.asarray(g.cn_edges.reshape(-1)),
            vn_edges_flat=np.asarray(g.vn_edges.reshape(-1)),
            z_roll_in=np.asarray(g.z_roll_in)[None],
            z_roll_out=np.asarray(g.z_roll_out)[None],
            deg_sign=deg_sign_cn[g.cn_of_edge],
            cn_deg_sign=deg_sign_cn,
        )


def _pad_edges(msg: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Append a sentinel slot (index E) along the edge axis so padded gathers
    pick up ``fill``."""
    pad_shape = msg.shape[:-1] + (1,)
    return jnp.concatenate([msg, jnp.full(pad_shape, fill, msg.dtype)], axis=-1)


def lift_roll_in(msg: jnp.ndarray, ga: GraphArrays) -> jnp.ndarray:
    """VN-copy z-index -> CN-copy z-index: out[b, z, e] = msg[b, (z+shift_e)%Z, e].

    Equivalent to the reference's ``x @ lifting_matrix_1.T`` applied per edge
    block (BoostedNeuralLDPCDecoder.py:380-384).
    """
    return jnp.take_along_axis(msg, ga.z_roll_in, axis=1)


def lift_roll_out(msg: jnp.ndarray, ga: GraphArrays) -> jnp.ndarray:
    """Inverse roll (reference ``x @ lifting_matrix_2``, :425-429)."""
    return jnp.take_along_axis(msg, ga.z_roll_out, axis=1)


def vn_marginal_sums(msg_c2v: jnp.ndarray, ga: GraphArrays) -> jnp.ndarray:
    """Sum CN->VN messages per variable node: [B, Z, E] -> [B, Z, N].

    Replaces the reference's ``llr @ W_output`` one-hot matmul (:513).
    """
    padded = _pad_edges(msg_c2v)
    g = padded[..., ga.vn_edges_flat]  # [B, Z, N*Dv]
    g = g.reshape(msg_c2v.shape[:-1] + (ga.N, ga.max_vn_degree))
    return g.sum(axis=-1)


def chan_to_edges(chan: jnp.ndarray, ga: GraphArrays) -> jnp.ndarray:
    """Broadcast per-VN values to edges: [B, Z, N] -> [B, Z, E]
    (replaces ``xa @ W_skipconn2even``, reference :376)."""
    return chan[..., ga.vn_of_edge]


def cn_to_edges(per_cn: jnp.ndarray, ga: GraphArrays) -> jnp.ndarray:
    """Broadcast per-CN values to edges: [..., M] -> [..., E]
    (replaces ``w @ W_skipconn2odd``, reference :447-497)."""
    return per_cn[..., ga.cn_of_edge]


def vn_update_extrinsic(
    chan_edge: jnp.ndarray,
    msg_c2v: jnp.ndarray,
    vn_sums: jnp.ndarray,
    ga: GraphArrays,
) -> jnp.ndarray:
    """VN->CN messages: channel LLR + extrinsic sum of incoming CN messages.

    Uses total-minus-self (vn_sums already holds the per-VN totals), which is
    the O(E) equivalent of the reference's ``llr @ W_odd2even`` extrinsic
    matmul (:377).
    """
    return chan_edge + vn_sums[..., ga.vn_of_edge] - msg_c2v


def cn_update_minsum(
    v2c: jnp.ndarray,
    ga: GraphArrays,
    parity_with_reference: bool = False,
    zero_handling: str = "standard",
) -> jnp.ndarray:
    """Check-node min-sum update, extrinsic per edge.  [B, Z, E] -> [B, Z, E]
    with z = CN-copy index on both sides.

    Replaces the reference's [B, Z, E, E] tile + masked min + masked
    sign-product (BoostedNeuralLDPCDecoder.py:394-423) with the two-min trick
    over the padded per-check layout.

    zero_handling (only meaningful with ``parity_with_reference``):
      * "standard": exact zeros participate normally (sign +1, magnitude 0).
      * "eps": boosted-reference behavior — add +1e-4 to exact zeros before
        the min and strip it after (BoostedNeuralLDPCDecoder.py:391-393,416).
      * "exclude": Dai-reference behavior — exact zeros are masked out of the
        min like non-edges (NeuralLDPCDecoder.py:74, which has no epsilon
        pass, so ``|x| + 1e4*(x==0)`` also swallows true zeros).
    """
    if parity_with_reference and zero_handling == "eps":
        # zero-avoidance so sign(0) cases match the reference (:391-393)
        v2c = v2c + _ZERO_EPS * (v2c == 0.0).astype(v2c.dtype)

    batch_shape = v2c.shape[:-1]
    abs_v = jnp.abs(v2c)
    if parity_with_reference and zero_handling == "exclude":
        abs_v = jnp.where(v2c == 0.0, _BIG, abs_v)
    padded_abs = _pad_edges(abs_v, fill=_BIG)
    g = padded_abs[..., ga.cn_edges_flat].reshape(batch_shape + (ga.M, ga.max_cn_degree))

    m1 = g.min(axis=-1)  # [B, Z, M]
    am = g.argmin(axis=-1)  # [B, Z, M]
    slot_iota = jnp.arange(ga.max_cn_degree, dtype=am.dtype)
    g_wo_min = jnp.where(slot_iota == am[..., None], _BIG, g)
    m2 = g_wo_min.min(axis=-1)  # [B, Z, M]

    # per-edge extrinsic min: m2 where this edge is the (first) argmin, else m1
    m1_e = m1[..., ga.cn_of_edge]
    m2_e = m2[..., ga.cn_of_edge]
    am_e = am[..., ga.cn_of_edge]
    extr_min = jnp.where(ga.slot_of_edge == am_e, m2_e, m1_e)

    if parity_with_reference and zero_handling == "eps":
        # reference removes the epsilon after the min (:416)
        extr_min = extr_min - _ZERO_EPS * (extr_min <= _ZERO_EPS).astype(extr_min.dtype)

    # sign: product over the check's other edges = total product * own sign
    sgn = jnp.where(v2c >= 0, 1.0, -1.0).astype(v2c.dtype)
    padded_sgn = _pad_edges(sgn, fill=1.0)
    gs = padded_sgn[..., ga.cn_edges_flat].reshape(batch_shape + (ga.M, ga.max_cn_degree))
    total_sign = gs.prod(axis=-1)  # [B, Z, M]
    extr_sign = total_sign[..., ga.cn_of_edge] * sgn

    if parity_with_reference:
        extr_sign = extr_sign * ga.deg_sign

    return extr_min * extr_sign


def cn_update_sumproduct(
    v2c: jnp.ndarray,
    ga: GraphArrays,
    parity_with_reference: bool = False,
) -> jnp.ndarray:
    """Check-node sum-product (tanh domain) update, extrinsic per edge.

    Replaces reference :400-408.  The extrinsic product excluding self is
    computed with a [B, Z, M, D, D] masked tile over max check degree D
    (D <= 15 here vs the reference's E x E tile).  This edge path keeps the
    tile formulation deliberately — it reproduces the reference's product
    structure for parity testing; the O(D) prefix/suffix form lives on the
    fast paths (ops/flat.cn_sumproduct_flat, the fused kernel).
    """
    batch_shape = v2c.shape[:-1]
    t = jnp.tanh(0.5 * v2c)
    padded_t = _pad_edges(t, fill=1.0)
    g = padded_t[..., ga.cn_edges_flat].reshape(batch_shape + (ga.M, ga.max_cn_degree))

    D = ga.max_cn_degree
    not_self = ~jnp.eye(D, dtype=bool)  # [D_out, D_in]
    tile = jnp.where(not_self, g[..., None, :], 1.0)  # [B, Z, M, D, D]
    ext_prod = tile.prod(axis=-1)  # [B, Z, M, D]

    ext_e = ext_prod.reshape(batch_shape + (ga.M * D,))[
        ..., ga.cn_of_edge * D + ga.slot_of_edge
    ]
    ext_e = jnp.clip(ext_e, -1.0 + _SP_EPS, 1.0 - _SP_EPS)
    msg = 2.0 * jnp.arctanh(ext_e)
    if parity_with_reference:
        msg = msg * ga.deg_sign
    return msg


def check_parity_indicator(
    app: jnp.ndarray,
    ga: GraphArrays,
    parity_with_reference: bool = False,
) -> jnp.ndarray:
    """Per-edge unsatisfied-check indicator from an APP vector [B, Z, N].

    Mirrors the reference's UCN detection pass
    (BoostedNeuralLDPCDecoder.py:339-368): hard-decide each VN copy, compute
    every lifted check's parity (product of decision signs over ALL of its
    edges, self included), and broadcast the result back to edges in VN-copy
    z-indexing.  Returns 1.0 where the edge's check is unsatisfied, else 0.0.

    In reference mode the decision sign matches ``(-APP > 0) - (-APP <= 0)``
    (:346-347); in standard convention APP > 0 means bit 0, so the decision
    sign is the sign of APP itself — both reduce to a parity of the same bits,
    differing only on exact zeros, which we resolve like the reference.
    """
    if parity_with_reference:
        neg = -app
        sign = jnp.where(neg > 0, 1.0, -1.0).astype(app.dtype)
    else:
        # bit = (app < 0); parity over bits == product of signs
        sign = jnp.where(app < 0, -1.0, 1.0).astype(app.dtype)

    sign_edge = chan_to_edges(sign, ga)  # [B, Z, E], VN-copy z
    sign_edge = lift_roll_in(sign_edge, ga)  # CN-copy z

    batch_shape = sign_edge.shape[:-1]
    padded = _pad_edges(sign_edge, fill=1.0)
    g = padded[..., ga.cn_edges_flat].reshape(batch_shape + (ga.M, ga.max_cn_degree))
    check_sign = g.prod(axis=-1)  # [B, Z, M]; -1 => odd parity => unsatisfied
    ucn_edge = (check_sign < 0).astype(app.dtype)[..., ga.cn_of_edge]
    return lift_roll_out(ucn_edge, ga)  # back to VN-copy z (reference :360-364)
