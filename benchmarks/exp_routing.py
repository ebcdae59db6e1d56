"""Experiment: gather-based vs one-hot-matmul (MXU) routing for the BP
iteration on TPU.

The reference encodes routing as dense one-hot matmuls (an MXU-friendly form);
our bp.py uses integer gathers (an O(E) form).  On TPU, minor-dim gathers can
lower poorly, so this measures both on the real chip to pick the default:

  v0  current ops/bp.py path (gathers + take_along_axis rolls)
  v1  matmul routing (shift-absorbed one-hot [NZ, EZ] operand), gather CN reduce
  v2  matmul routing + per-slot matmul CN select (D matmuls, no gathers at all)
  v3  v2 with bf16 matmul operands

Workload: wman N=576 R=3/4, plain min-sum, 5 iterations (bench.py headline).
Run: python benchmarks/exp_routing.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.ops import bp

ITERS = 5


def build_tables(g: TannerGraph):
    """Shift-absorbed one-hot routing operands.

    Flat VN-copy index p = n*Z + z  (chan layout [B, N*Z]).
    Flat CN-form edge index q = e*Z + z  (z = CN-copy index).
    R[p, q] = 1 iff vn_of_edge[e] = n and z_vn = (z_cn + shift_e) % Z.
    """
    Z, E, N, M = g.Z, g.E, g.N, g.M
    e = np.arange(E)[:, None]
    zc = np.arange(Z)[None, :]
    zv = (zc + g.shift_of_edge[:, None]) % Z
    p = g.vn_of_edge[:, None] * Z + zv  # [E, Z]
    q = e * Z + zc
    R = np.zeros((N * Z, E * Z), np.float32)
    R[p.ravel(), q.ravel()] = 1.0

    # per-slot CN selectors: S[d][e_flat... ] -> want [B, EZ] -> [B, MZ] pick
    # slot-d edge of each check (zero if degree < d).  T_d[q, (m*Z+z)] = 1 iff
    # e == cn_edges[m, d] and z matches.
    D = g.max_cn_degree
    Ts = np.zeros((D, E * Z, M * Z), np.float32)
    for d in range(D):
        for m in range(M):
            ed = g.cn_edges[m, d]
            if ed >= E:
                continue
            z = np.arange(Z)
            Ts[d, ed * Z + z, m * Z + z] = 1.0
    # broadcast per-check back to edges: C[m*Z+z, e*Z+z] = 1 iff cn_of_edge[e]==m
    C = np.zeros((M * Z, E * Z), np.float32)
    z = np.arange(Z)
    for ee in range(E):
        C[g.cn_of_edge[ee] * Z + z, ee * Z + z] = 1.0
    return R, Ts, C


BIG = 10000.0


def minsum_from_padded(gmat):
    """gmat: [B, M, D] abs values (BIG = pad).  Returns (m1, m2, am)."""
    m1 = gmat.min(axis=-1)
    am = gmat.argmin(axis=-1)
    slot_iota = jnp.arange(gmat.shape[-1], dtype=am.dtype)
    m2 = jnp.where(slot_iota == am[..., None], BIG, gmat).min(axis=-1)
    return m1, m2, am


def make_v0(g):
    ga = bp.GraphArrays.from_graph(g)

    def decode(chan_llr):  # [B, N, Z]
        chan = jnp.swapaxes(chan_llr, 1, 2)  # [B, Z, N]
        msg = jnp.zeros(chan.shape[:2] + (ga.E,), jnp.float32)
        sums = jnp.zeros_like(chan)
        for _ in range(ITERS):
            chan_edge = bp.chan_to_edges(chan, ga)
            v2c = bp.vn_update_extrinsic(chan_edge, msg, sums, ga)
            v2c = bp.lift_roll_in(v2c, ga)
            v2c = jnp.clip(v2c, -20.0, 20.0)
            c2v = bp.cn_update_minsum(v2c, ga)
            msg = bp.lift_roll_out(c2v, ga)
            sums = bp.vn_marginal_sums(msg, ga)
        return chan + sums

    return decode


def make_v1(g, dtype=jnp.float32):
    R, _, _ = build_tables(g)
    Rj = jnp.asarray(R, dtype)
    ga = bp.GraphArrays.from_graph(g)
    E, Z, M, D = g.E, g.Z, g.M, g.max_cn_degree
    # CN reduce gather indices on flat [B, E*Z] -> [B, M*D, Z] view
    pad_ids = np.minimum(g.cn_edges, E).reshape(-1)  # [M*D], E = pad
    cn_flat = jnp.asarray(pad_ids.astype(np.int32))
    cn_of_edge = jnp.asarray(g.cn_of_edge)
    slot_of_edge = jnp.asarray(g.slot_of_edge)

    def decode(chan_llr):  # [B, N, Z]
        B = chan_llr.shape[0]
        chan = chan_llr.reshape(B, -1)  # [B, NZ]
        msg = jnp.zeros((B, E * Z), jnp.float32)  # CN-form
        sums = jnp.zeros_like(chan)
        for _ in range(ITERS):
            v2c = jnp.dot((chan + sums).astype(dtype), Rj,
                          preferred_element_type=jnp.float32) - msg
            v2c = jnp.clip(v2c, -20.0, 20.0)
            # CN reduce via gather on axis 1 (major): [B, E, Z] pad-> [B, M*D, Z]
            ve = v2c.reshape(B, E, Z)
            vp = jnp.concatenate([jnp.abs(ve), jnp.full((B, 1, Z), BIG)], axis=1)
            gmat = vp[:, cn_flat, :].reshape(B, M, D, Z)
            m1, m2, am = minsum_from_padded(jnp.swapaxes(gmat, 2, 3))  # [B,M,Z]
            sp = jnp.concatenate(
                [jnp.where(ve >= 0, 1.0, -1.0), jnp.ones((B, 1, Z))], axis=1
            )[:, cn_flat, :].reshape(B, M, D, Z).prod(axis=2)  # [B, M, Z]
            m1e = m1[:, cn_of_edge, :]
            m2e = m2[:, cn_of_edge, :]
            ame = am[:, cn_of_edge, :]
            mag = jnp.where(slot_of_edge[None, :, None] == ame, m2e, m1e)
            sgn = sp[:, cn_of_edge, :] * jnp.where(ve >= 0, 1.0, -1.0)
            msg = (mag * sgn).reshape(B, E * Z)
            sums = jnp.dot(msg.astype(dtype), Rj.T, preferred_element_type=jnp.float32)
        return chan + sums

    return decode


def make_v2(g, dtype=jnp.float32):
    R, Ts, C = build_tables(g)
    Rj = jnp.asarray(R, dtype)
    Tsj = jnp.asarray(Ts, dtype)  # [D, EZ, MZ]
    Cj = jnp.asarray(C, dtype)  # [MZ, EZ]
    E, Z, M, D = g.E, g.Z, g.M, g.max_cn_degree
    # slot-of-edge expanded to flat EZ (same slot for all z of an edge)
    slot_flat = jnp.asarray(np.repeat(g.slot_of_edge, Z).astype(np.int32))
    pad_mask = jnp.asarray(  # [D, MZ] 1 where slot d exists for check m
        np.stack([(g.cn_edges[:, d] < E).repeat(Z) for d in range(D)]).astype(np.float32)
    )

    def decode(chan_llr):
        B = chan_llr.shape[0]
        chan = chan_llr.reshape(B, -1)
        msg = jnp.zeros((B, E * Z), jnp.float32)
        sums = jnp.zeros_like(chan)
        for _ in range(ITERS):
            v2c = jnp.dot((chan + sums).astype(dtype), Rj,
                          preferred_element_type=jnp.float32) - msg
            v2c = jnp.clip(v2c, -20.0, 20.0)
            a = jnp.abs(v2c)
            s = jnp.where(v2c >= 0, 1.0, -1.0)
            # [B, EZ] @ [EZ, MZ] per slot -> [D, B, MZ]
            gmat = jnp.einsum("be,dem->dbm", a.astype(dtype), Tsj,
                              preferred_element_type=jnp.float32)
            gmat = jnp.where(pad_mask[:, None, :] > 0, gmat, BIG)
            sprod = jnp.einsum("be,dem->dbm", s.astype(dtype), Tsj,
                               preferred_element_type=jnp.float32)
            sprod = jnp.where(pad_mask[:, None, :] > 0, sprod, 1.0)
            gmat = jnp.moveaxis(gmat, 0, -1)  # [B, MZ, D]
            m1, m2, am = minsum_from_padded(gmat)
            sp_all = jnp.moveaxis(sprod, 0, -1).prod(axis=-1)  # [B, MZ]
            # back to edges
            m1e = jnp.dot(m1.astype(dtype), Cj, preferred_element_type=jnp.float32)
            m2e = jnp.dot(m2.astype(dtype), Cj, preferred_element_type=jnp.float32)
            ame = jnp.dot(am.astype(dtype), Cj, preferred_element_type=jnp.float32)
            spe = jnp.dot(sp_all.astype(dtype), Cj, preferred_element_type=jnp.float32)
            mag = jnp.where(slot_flat[None, :].astype(jnp.float32) == ame, m2e, m1e)
            msg = mag * spe * s
            sums = jnp.dot(msg.astype(dtype), Rj.T, preferred_element_type=jnp.float32)
        return chan + sums

    return decode


def timeit(fn, x, label):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x))
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    wps = x.shape[0] / dt
    print(f"{label:34s} B={x.shape[0]:6d}  {dt*1e3:8.3f} ms  {wps:12,.0f} words/s")
    return out, wps


def main():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    rng = np.random.default_rng(0)

    v0, v1, v2 = make_v0(g), make_v1(g), make_v2(g)
    v1b = make_v1(g, jnp.bfloat16)
    v2b = make_v2(g, jnp.bfloat16)

    # correctness cross-check at small batch
    xs = jnp.asarray(rng.normal(size=(64, code.N, code.Z)).astype(np.float32) * 3)
    o0 = jax.jit(v0)(xs)
    o0f = jnp.swapaxes(o0, 1, 2).reshape(64, -1)
    for name, f in [("v1", v1), ("v2", v2)]:
        o = jax.jit(f)(xs)
        err = float(jnp.max(jnp.abs(o - o0f)))
        print(f"{name} max|diff| vs v0: {err:.2e}")
        # TPU MXU f32 matmuls run in bf16-pass precision by default; the
        # one-hot routing therefore carries ~1e-3 relative noise vs gathers.
        assert err < 0.5, name

    for B in (4096, 16384, 65536):
        x = jnp.asarray(rng.normal(size=(B, code.N, code.Z)).astype(np.float32) * 3)
        timeit(v0, x, "v0 gather (current)")
        timeit(v1, x, "v1 matmul-route + gather-CN")
        timeit(v2, x, "v2 all-matmul")
        timeit(v1b, x, "v1 bf16")
        timeit(v2b, x, "v2 bf16")
        print()


if __name__ == "__main__":
    main()
