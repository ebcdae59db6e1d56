"""Structural tests for the Tanner edge tables and dense-matrix reconstruction."""

import numpy as np
import pytest

from neural_ldpc_tpu.codes import TannerGraph, get_code


@pytest.fixture(params=["wman_n576_r34_z24", "nr_bg2_set0_z16"])
def code(request):
    return get_code(request.param)


@pytest.fixture
def graph(code):
    return TannerGraph.from_basegraph(code.basegraph, code.Z)


def test_code_specs():
    wman = get_code("wman_n576_r34_z24")
    assert (wman.M, wman.N, wman.Z, wman.n_bits) == (6, 24, 24, 576)
    bg2 = get_code("nr_bg2_set0_z16")
    assert (bg2.M, bg2.N, bg2.Z, bg2.n_bits) == (42, 52, 16, 832)
    assert bg2.gen_matrix.shape == (160, 832)


def test_edge_counts(code, graph):
    expected_E = int((code.basegraph != -1).sum())
    assert graph.E == expected_E
    assert graph.cn_degree.sum() == graph.E == graph.vn_degree.sum()
    # wman: E=88, max deg (15, 6); bg2: E=197, max deg (10, 23)
    if code.name.startswith("wman"):
        assert (graph.E, graph.max_cn_degree, graph.max_vn_degree) == (88, 15, 6)
    else:
        assert (graph.E, graph.max_cn_degree, graph.max_vn_degree) == (197, 10, 23)


def test_edge_order_is_row_major(graph):
    # CN-order: lexicographic by (check, variable)
    pairs = list(zip(graph.cn_of_edge.tolist(), graph.vn_of_edge.tolist()))
    assert pairs == sorted(pairs)
    # contiguous grouping per check
    assert np.array_equal(graph.row_ptr[graph.cn_of_edge] + graph.slot_of_edge,
                          np.arange(graph.E))


def test_permutations_are_inverse(graph):
    assert np.array_equal(graph.perm_cn2vn[graph.perm_vn2cn], np.arange(graph.E))
    assert np.array_equal(graph.perm_vn2cn[graph.perm_cn2vn], np.arange(graph.E))
    # VN-order is lexicographic by (variable, check)
    pairs = [(graph.vn_of_edge[e], graph.cn_of_edge[e]) for e in graph.perm_vn2cn]
    assert pairs == sorted(pairs)


def test_padded_layouts(graph):
    assert graph.cn_mask.sum() == graph.E
    assert graph.vn_mask.sum() == graph.E
    real = graph.cn_edges[graph.cn_mask]
    assert np.array_equal(np.sort(real), np.arange(graph.E))
    real_v = graph.vn_edges[graph.vn_mask]
    assert np.array_equal(np.sort(real_v), np.arange(graph.E))
    # every padded entry maps back to its owner
    for m in range(graph.M):
        for e in graph.cn_edges[m][graph.cn_mask[m]]:
            assert graph.cn_of_edge[e] == m


def test_roll_tables(graph):
    x = np.random.default_rng(0).normal(size=(graph.Z, graph.E))
    rolled = np.take_along_axis(x, graph.z_roll_in, axis=0)
    for e in range(0, graph.E, 7):
        s = graph.shift_of_edge[e]
        assert np.array_equal(rolled[:, e], np.roll(x[:, e], -s))
    unrolled = np.take_along_axis(rolled, graph.z_roll_out, axis=0)
    assert np.array_equal(unrolled, x)


def test_routing_matrix_invariants(graph):
    """Verify the structural properties SURVEY.md §2.4 established for the
    reference's matrices, on our reconstruction."""
    mats = graph.routing_matrices()
    E = graph.E
    vn_deg_of_edge_v = graph.vn_degree[graph.vn_of_edge[graph.perm_vn2cn]]
    cn_deg_of_edge_v = graph.cn_degree[graph.cn_of_edge[graph.perm_vn2cn]]

    assert np.array_equal(mats["W_skipconn2even"].sum(axis=0), np.ones(E))
    assert np.array_equal(mats["W_odd2even"].sum(axis=0), vn_deg_of_edge_v - 1)
    # W_even2odd rows are VN-order edge indices (SURVEY §2.4)
    assert np.array_equal(mats["W_even2odd"].sum(axis=1), cn_deg_of_edge_v - 1)
    assert np.array_equal(mats["W_even2odd_with_self"].sum(axis=1), cn_deg_of_edge_v)
    assert np.array_equal(mats["W_output"].sum(axis=1), np.ones(E))
    assert np.array_equal(mats["W_skipconn2odd"].sum(axis=0), np.ones(E))
    for key in ("lifting_matrix_1", "lifting_matrix_2"):
        L = mats[key]
        assert np.array_equal(L.sum(axis=0), np.ones(E * graph.Z))
        assert np.array_equal(L.sum(axis=1), np.ones(E * graph.Z))
        # block-diagonal permutation
        assert np.array_equal(L @ L.T, np.eye(E * graph.Z))


def test_lifted_h_matrix_annihilates_generator():
    code = get_code("nr_bg2_set0_z16")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    H = graph.lifted_parity_check_matrix()
    assert H.shape == (code.n_checks, code.n_bits)
    assert ((H.astype(np.int64) @ code.gen_matrix.T) % 2).sum() == 0
    # random codewords have zero syndrome
    rng = np.random.default_rng(1)
    cw = (rng.integers(0, 2, (8, code.n_info_bits)) @ code.gen_matrix) % 2
    assert ((H.astype(np.int64) @ cw.T) % 2).sum() == 0


def test_routing_matrices_match_torch_reference(code, graph, torch_reference):
    """Exact equality with the reference ConnectingMatrix (differential)."""
    from boosted_neural_ldpc_decoder.ConnectingMatrix import ConnectingMatrix

    ref = ConnectingMatrix(Z=code.Z, basegraph=code.basegraph.copy())
    ours = graph.routing_matrices()
    for key in ours:
        ref_mat = getattr(ref, key)
        assert np.array_equal(ours[key], ref_mat), f"{key} differs"


def test_derived_generator_matrix_wman():
    """codes/gf2.py: derive G from the lifted H for the wman code (which the
    reference ships no generator for) — H @ G.T must vanish over GF(2) and
    rows must be systematic on the info positions."""
    import jax.numpy as jnp

    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.codes.gf2 import rank_gf2

    code = get_code("wman_n576_r34_z24")
    assert code.gen_matrix is None
    derived = code.with_derived_generator()
    G = derived.gen_matrix
    assert G.shape == (code.n_info_bits, code.n_bits)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    H = g.lifted_parity_check_matrix()
    assert rank_gf2(H) == code.n_checks
    syn = (H.astype(np.int64) @ G.T.astype(np.int64)) % 2
    assert not syn.any()

    # random codewords through the channel encoder satisfy H too
    from neural_ldpc_tpu import native
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, size=(16, code.n_info_bits)).astype(np.uint8)
    cw = native.gf2_encode(info, native.pack_rows(G), code.n_bits)
    assert native.gf2_syndrome_ok(cw, native.pack_rows(H), code.n_bits).all()
    # non-trivial codewords (not all-zero)
    assert cw.sum() > 0


def test_code_rate_shortening_semantics():
    """Shortened positions are known-zero info bits: they leave the numerator
    AND the transmitted length."""
    from neural_ldpc_tpu.codes import get_code

    code = get_code("nr_bg2_set0_z16")  # K*Z=160, N*Z=832
    assert code.code_rate() == 160 / 832
    assert code.code_rate(n_punctured_bits=32) == 160 / 800
    assert code.code_rate(n_shortened_bits=60) == (160 - 60) / (832 - 60)
    assert code.code_rate(32, 60) == 100 / 740


def test_nr_bg1_like_resource():
    """The BG1-structured code (round 4): dimensions/template, 4-cycle-free
    lifting at Z=384, and a derivable generator at a small lift."""
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.codes.gf2 import rank_gf2

    code = get_code("nr_bg1_like_z384")
    assert (code.M, code.N, code.Z) == (46, 68, 384)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    assert g.E == 316
    degs = np.diff(g.row_ptr)
    assert degs.min() >= 2 and degs.max() <= 22
    # staircase extension: identity (shift 0) on the diagonal columns
    bg = code.basegraph
    for i, r in enumerate(range(4, 46)):
        assert bg[r, 26 + i] == 0
    # no 4-cycles at the full lift: every 2x2 submatrix shift condition holds
    for r1 in range(46):
        c1s = np.nonzero(bg[r1] >= 0)[0]
        for r2 in range(r1 + 1, 46):
            shared = [c for c in c1s if bg[r2, c] >= 0]
            for a in range(len(shared)):
                for b in range(a + 1, len(shared)):
                    ca, cb = shared[a], shared[b]
                    assert (bg[r1, ca] - bg[r1, cb] + bg[r2, cb] - bg[r2, ca]) % 384 != 0
    # generator derivable (full-rank H) at Z=8
    g8 = TannerGraph.from_basegraph(code.basegraph, 8)
    H8 = g8.lifted_parity_check_matrix()
    assert rank_gf2(H8) == H8.shape[0]


def test_qc_generator_small_lift_matches_parity():
    """codes/qc_encode.py: the QC-form generator (one Z-bit polynomial per
    parity/info block pair, derived by a single bit-packed GF(2) solve)
    expands to a dense systematic G with H @ G.T = 0, and the response to
    info bit (i, z) is the z-rotation of the response to (i, 0) — the QC
    property that lets the BG1-scale generator ship as 49 KB instead of
    220 MB."""
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.codes.qc_encode import (
        expand_qc_generator, pack_qc_polys, qc_generator_polys, unpack_qc_polys,
    )

    code = get_code("nr_bg1_like_z384")
    Z = 8
    polys = qc_generator_polys(code.basegraph, Z)
    M = code.basegraph.shape[0]
    K = code.N - M
    assert polys.shape == (M, K, Z)
    G = expand_qc_generator(polys, Z)
    g = TannerGraph.from_basegraph(code.basegraph, Z)
    H = g.lifted_parity_check_matrix()
    assert not ((H.astype(np.int64) @ G.T.astype(np.int64)) % 2).any()
    # systematic info part
    assert np.array_equal(G[:, : K * Z], np.eye(K * Z, dtype=np.uint8))
    # QC rotation property via the dense expansion
    for i, z in ((0, 3), (7, 5)):
        resp0 = G[i * Z, K * Z:].reshape(M, Z)
        respz = G[i * Z + z, K * Z:].reshape(M, Z)
        assert np.array_equal(respz, np.roll(resp0, z, axis=1))
    # pack/unpack round trip
    assert np.array_equal(unpack_qc_polys(pack_qc_polys(polys), Z), polys)


@pytest.mark.slow
def test_bg1_gen_registry_random_codewords():
    """get_code("nr_bg1_like_z384_gen") ships a generator whose random
    codewords satisfy every lifted check — the capability the reference has
    only for BG2/Z=16 (AWGNPassedDatagen.py:200-203), at BG1 scale.  Slow:
    expands the 220 MB dense G."""
    from neural_ldpc_tpu.codes import TannerGraph, get_code

    code = get_code("nr_bg1_like_z384_gen")
    assert code.gen_matrix is not None
    assert code.gen_matrix.shape == (code.n_info_bits, code.n_bits)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, size=(4, code.n_info_bits)).astype(np.uint8)
    cw = (info.astype(np.int64) @ code.gen_matrix.astype(np.int64) % 2).astype(
        np.uint8).reshape(4, code.N, code.Z)
    syn = np.zeros((4, g.M, code.Z), np.uint8)
    z = np.arange(code.Z)
    for e in range(g.E):
        i, j, s = (int(g.cn_of_edge[e]), int(g.vn_of_edge[e]),
                   int(g.shift_of_edge[e]))
        syn[:, i, z] ^= cw[:, j, (z + s) % code.Z]
    assert not syn.any()
