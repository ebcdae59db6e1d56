"""Independent brute-force numpy BP decoder used as a test oracle.

Written directly from the algorithm definitions (standard convention, float64,
explicit per-edge loops) — deliberately NOT sharing any code with the
framework so decoder tests are a true differential check.
"""

from __future__ import annotations

import numpy as np


def oracle_decode_minsum(
    basegraph: np.ndarray,
    Z: int,
    chan_llr: np.ndarray,  # [B, N, Z]
    n_iterations: int,
    cn_weight_per_iter=None,  # [I] scalars or [I, E] per-edge (CN-order), or None
    vn_weight_per_iter=None,  # [I] scalars or [I, N], or None
    bias_per_iter=None,  # [I, E] per-edge additive bias (Dai), or None
    llr_clip=None,  # (lo, hi) applied like the boosted decoder, or None
    sum_product: bool = False,
):
    """Returns per-iteration APP [I, B, N*Z] in flat bit order n*Z+z.

    Connectivity: CN copy (i, z) of proto edge (i, j, shift s) touches VN copy
    (j, (z+s)%Z).  Standard convention: CN message = prod(sign) * min|.| over
    the other edges (or 2*atanh(prod tanh(x/2)) for sum-product).
    """
    bg = np.asarray(basegraph)
    M, N = bg.shape
    edges = [(i, j, bg[i, j] % Z) for i in range(M) for j in range(N) if bg[i, j] != -1]
    E = len(edges)
    B = chan_llr.shape[0]
    chan = chan_llr.astype(np.float64)  # [B, N, Z]

    # messages per (edge, z_cn): c2v[e][z] = message from CN copy (i, z) to VN copy (j, (z+s)%Z)
    c2v = np.zeros((B, E, Z))
    outs = []
    for it in range(n_iterations):
        vw = None
        if vn_weight_per_iter is not None:
            vw = np.broadcast_to(np.atleast_1d(vn_weight_per_iter[it]), (N,))
        # v2c[e][z_cn] = weighted chan[j, (z+s)%Z] + sum of other c2v into that VN copy
        v2c = np.zeros((B, E, Z))
        for e, (i, j, s) in enumerate(edges):
            for z in range(Z):
                zv = (z + s) % Z
                total = 0.0 + chan[:, j, zv] * (vw[j] if vw is not None else 1.0)
                for e2, (i2, j2, s2) in enumerate(edges):
                    if j2 == j and e2 != e:
                        # c2v[e2] arrives at VN copy (j, (z2 + s2) % Z) from CN copy z2
                        z2 = (zv - s2) % Z
                        total = total + c2v[:, e2, z2]
                v2c[:, e, z] = total
        if llr_clip is not None:
            v2c = np.clip(v2c, llr_clip[0], llr_clip[1])

        # CN update
        new_c2v = np.zeros((B, E, Z))
        for e, (i, j, s) in enumerate(edges):
            others = [e2 for e2, (i2, _, _) in enumerate(edges) if i2 == i and e2 != e]
            for z in range(Z):
                vals = np.stack([v2c[:, e2, z] for e2 in others], axis=0)  # [deg-1, B]
                if sum_product:
                    prod = np.prod(np.tanh(vals / 2.0), axis=0)
                    prod = np.clip(prod, -1 + 1e-7, 1 - 1e-7)
                    new_c2v[:, e, z] = 2.0 * np.arctanh(prod)
                else:
                    signs = np.where(vals >= 0, 1.0, -1.0).prod(axis=0)
                    mags = np.abs(vals).min(axis=0)
                    new_c2v[:, e, z] = signs * mags

        # weighting
        if cn_weight_per_iter is not None:
            w = np.broadcast_to(np.atleast_1d(cn_weight_per_iter[it]), (E,))
        else:
            w = np.ones(E)
        for e in range(E):
            mag = np.abs(new_c2v[:, e, :]) * w[e]
            if bias_per_iter is not None:
                mag = mag + bias_per_iter[it][e]
            mag = np.maximum(mag, 0.0)
            if llr_clip is not None:
                mag = np.clip(mag, llr_clip[0], llr_clip[1])
            new_c2v[:, e, :] = mag * np.sign(new_c2v[:, e, :])
        c2v = new_c2v

        # APP
        app = chan.copy()
        if llr_clip is not None:
            pass  # channel term is used unclipped (matches boosted marginal)
        for e, (i, j, s) in enumerate(edges):
            for z in range(Z):
                zv = (z + s) % Z
                app[:, j, zv] += c2v[:, e, z]
        if llr_clip is not None:
            app = np.clip(app, llr_clip[0], llr_clip[1])
        outs.append(app.reshape(B, N * Z))
    return np.stack(outs)
