"""Construct the BG1-scale QC-LDPC resource (round 4, VERDICT item 4).

The true 3GPP 38.212 base graph 1 shift tables cannot be reproduced in this
offline environment (zero egress; the reference ships only BG2 set 0).  This
script constructs a code with BG1's exact structural template instead —
46 x 68 base matrix, 22 information columns, a 4-row high-density core with a
dual-diagonal parity sub-block, identity ("staircase") extension columns for
rows 4..45, E = 316 edges, lifts to Z = 384 — with cyclic shifts chosen by a
randomized 4-cycle-avoidance search (girth >= 6 at Z = 384).  Every scaling
claim made on this code is therefore a real-structure claim, while the shift
VALUES are constructed, not standardized; PARITY.md documents the divergence.

Deterministic (seeded); writes neural_ldpc_tpu/resources/nr_bg1_like.pcm and
validates: E = 316, row degrees match the profile, H full rank at Z = 8
(generator derivable), no 4-cycles at Z = 384.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

M, N, KB = 46, 68, 22
CORE_ROWS, CORE_COLS = 4, 4  # rows 0..3, parity columns 22..25
ZMAX = 384
E_TARGET = 316
SEED = 20260818


def build_mask(rng):
    """Edge positions [M, N] bool following the BG1 template."""
    mask = np.zeros((M, N), bool)
    # high-density core rows: 17 of the 22 info columns each (degree ~19
    # with the parity taps, matching BG1's core-row density), always
    # including columns 0/1 (the heavily-connected punctured pair in BG1)
    for r in range(CORE_ROWS):
        mask[r, [0, 1]] = True
        cols = 2 + rng.choice(KB - 2, size=15, replace=False)
        mask[r, cols] = True
    # dual-diagonal core parity sub-block (columns 22..25).  Round 5: the
    # tap pattern is chosen so the core's ring determinant has an ODD number
    # of monomial terms (det = x^a+x^b+x^c here) — an even count vanishes at
    # x=1 for EVERY shift assignment, making the parity part structurally
    # singular and a systematic QC generator impossible (the r4 pattern had
    # that flaw; see codes/qc_encode.py)
    mask[0, KB] = mask[0, KB + 1] = True
    mask[1, KB + 1] = mask[1, KB + 2] = True
    mask[2, KB + 2] = mask[2, KB + 3] = True
    mask[3, KB] = mask[3, KB + 1] = mask[3, KB + 3] = True
    # extension rows: one identity column each (staircase), plus info/core taps
    used = int(mask.sum())
    ext_rows = M - CORE_ROWS
    budget = E_TARGET - used - ext_rows  # info/core taps left to place
    # degree profile for extension rows: linearly decaying (denser rows first)
    w = np.linspace(2.2, 0.8, ext_rows)
    degs = np.maximum(2, np.round(budget * w / w.sum()).astype(int))
    # fix rounding drift
    while degs.sum() > budget:
        degs[np.argmax(degs)] -= 1
    while degs.sum() < budget:
        degs[np.argmin(degs)] += 1
    for i, r in enumerate(range(CORE_ROWS, M)):
        mask[r, KB + CORE_COLS + i] = True  # identity extension column
        cols = rng.choice(KB + CORE_COLS, size=degs[i], replace=False)
        mask[r, cols] = True
    return mask


def four_cycle_pairs(mask):
    """(r1, r2, c1, c2) tuples where two rows share two columns."""
    out = []
    cols_of = [np.nonzero(mask[r])[0] for r in range(M)]
    for r1 in range(M):
        s1 = set(cols_of[r1])
        for r2 in range(r1 + 1, M):
            shared = sorted(s1 & set(cols_of[r2]))
            for a in range(len(shared)):
                for b in range(a + 1, len(shared)):
                    out.append((r1, r2, shared[a], shared[b]))
    return out


def assign_shifts(mask, rng):
    """Random shifts, then repair 4-cycles: for each violated 2x2 submatrix
    re-draw one participating shift until no residual cycles at ZMAX."""
    shifts = np.where(mask, rng.integers(0, ZMAX, size=mask.shape), -1)
    # staircase extension entries are identity (shift 0), BG1-style
    for i, r in enumerate(range(CORE_ROWS, M)):
        shifts[r, KB + CORE_COLS + i] = 0
    pairs = four_cycle_pairs(mask)
    for _ in range(200):
        bad = [(r1, r2, c1, c2) for r1, r2, c1, c2 in pairs
               if (shifts[r1, c1] - shifts[r1, c2]
                   + shifts[r2, c2] - shifts[r2, c1]) % ZMAX == 0]
        if not bad:
            return shifts
        for r1, r2, c1, c2 in bad:
            # re-draw a non-staircase participant
            for (r, c) in ((r1, c1), (r1, c2), (r2, c1), (r2, c2)):
                if not (r >= CORE_ROWS and c == KB + CORE_COLS + (r - CORE_ROWS)):
                    shifts[r, c] = rng.integers(0, ZMAX)
                    break
    raise RuntimeError("4-cycle repair did not converge")


def core_invertible(shifts, lifts=(8, 16, 24, 128, 384)):
    """The encoder solves H_p p = H_i s; with the identity staircase, H_p is
    invertible iff the 4x4-block dual-diagonal core B is (3GPP BG1 fixes a
    shift PATTERN to guarantee this for every Z — with searched shifts we
    must check).  Verified at every lift the tests/genmatrix ship."""
    from neural_ldpc_tpu.codes.gf2 import gf2_solve

    core = [(r, c) for r in range(CORE_ROWS)
            for c in range(KB, KB + CORE_COLS) if shifts[r, c] >= 0]
    for Z in lifts:
        B = np.zeros((CORE_ROWS * Z, CORE_ROWS * Z), np.uint8)
        z = np.arange(Z)
        for r, c in core:
            B[r * Z + z, (c - KB) * Z + (z + shifts[r, c]) % Z] = 1
        try:
            gf2_solve(B, np.zeros((CORE_ROWS * Z, 0), np.uint8))
        except ValueError:
            return False
    return True


def main():
    from neural_ldpc_tpu.codes.gf2 import rank_gf2
    from neural_ldpc_tpu.codes.tanner import TannerGraph

    rng = np.random.default_rng(SEED)
    mask = build_mask(rng)
    assert int(mask.sum()) == E_TARGET, int(mask.sum())
    # round 5: redraw until the parity core is ring-invertible at every
    # shipped lift, so a QC generator exists (codes/qc_encode.py)
    for attempt in range(100):
        shifts = assign_shifts(mask, rng)
        if core_invertible(shifts):
            print(f"core invertible (attempt {attempt})")
            break
    else:
        raise RuntimeError("no invertible core found; change SEED")

    # validations
    g384 = TannerGraph.from_basegraph(shifts, ZMAX)
    assert g384.E == E_TARGET
    degs = np.diff(g384.row_ptr)
    assert degs.min() >= 2 and degs.max() <= KB + CORE_COLS
    # full rank at a small lift => generator derivable (rank property is
    # lift-dependent; the Z=8 check keeps this script fast)
    g8 = TannerGraph.from_basegraph(shifts, 8)
    H8 = g8.lifted_parity_check_matrix()
    r = rank_gf2(H8)
    print(f"rank(H@Z=8) = {r} / {H8.shape[0]}")
    assert r == H8.shape[0], "H rank-deficient; tweak SEED"

    out = os.path.join(REPO, "neural_ldpc_tpu", "resources", "nr_bg1_like.pcm")
    with open(out, "w") as f:
        f.write(
            "# BG1-STRUCTURED QC-LDPC (46x68, kb=22, E=316, Z<=384).\n"
            "# NOT the 3GPP 38.212 BG1 shift table (not reproducible in this\n"
            "# offline build environment): same dimensions/structure template\n"
            "# (dual-diagonal core, identity staircase extension), shifts from\n"
            f"# a seeded 4-cycle-free search (seed {SEED}, girth>=6 at Z=384).\n"
            "# Generated by scripts/make_bg1_like.py; see PARITY.md.\n"
        )
        for row in shifts:
            f.write(",".join(str(int(v)) for v in row) + "\n")
    print("wrote", out, "E =", E_TARGET, "row degs",
          degs.min(), "-", degs.max())


if __name__ == "__main__":
    main()
