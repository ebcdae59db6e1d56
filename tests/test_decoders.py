"""Decoder correctness: numpy-oracle differential tests (standalone) plus
bit-level parity tests against the torch reference (skipped when absent)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import (
    BoostedDecoderConfig,
    BoostedNeuralDecoder,
    NeuralDecoderConfig,
    NeuralMinSumDecoder,
)
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

from oracle import oracle_decode_minsum


def small_code():
    """Tiny hand-made protograph for the slow oracle: 3x6 base graph, Z=4."""
    bg = np.array([
        [0, 1, -1, 2, 3, -1],
        [2, -1, 1, -1, 0, 3],
        [-1, 3, 0, 1, -1, 2],
    ])
    return bg, 4


@pytest.mark.parametrize("sum_product", [False, True])
def test_boosted_decoder_matches_oracle(sum_product):
    bg, Z = small_code()
    g = TannerGraph.from_basegraph(bg, Z)
    B, iters = 3, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, g.N, Z)).astype(np.float32) * 2

    cfg = BoostedDecoderConfig(
        n_iterations=iters,
        decoder_type=DecoderType.SP if sum_product else DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3),
        convention=Convention.STANDARD,
    )
    dec = BoostedNeuralDecoder(g, cfg)
    params = dec.init_params()
    cn_w = rng.uniform(0.3, 1.8, size=(iters, 1)).astype(np.float32)
    vn_w = rng.uniform(0.3, 1.8, size=(iters, 1)).astype(np.float32)
    params["weight_cn"] = jnp.asarray(cn_w)
    params["weight_vn"] = jnp.asarray(vn_w)
    ours = np.asarray(dec.apply(params, jnp.asarray(x)))

    ref = oracle_decode_minsum(
        bg, Z, x, iters,
        cn_weight_per_iter=cn_w[:, 0], vn_weight_per_iter=vn_w[:, 0],
        llr_clip=(-20.0, 20.0), sum_product=sum_product,
    )
    # SP's atanh near saturation amplifies f32-vs-f64 noise; MS is tight.
    np.testing.assert_allclose(ours, ref, atol=0.05 if sum_product else 2e-4)


def test_neural_decoder_matches_oracle():
    bg, Z = small_code()
    g = TannerGraph.from_basegraph(bg, Z)
    B, iters = 3, 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, g.N, Z)).astype(np.float32) * 2

    dec = NeuralMinSumDecoder(g, NeuralDecoderConfig(n_iterations=iters))
    params = dec.init_params()
    w = rng.uniform(0.3, 1.5, size=(iters, g.E)).astype(np.float32)
    b = rng.uniform(-0.2, 0.2, size=(iters, g.E)).astype(np.float32)
    params = {"weights_var": jnp.asarray(w), "biases_var": jnp.asarray(b)}
    ours = np.asarray(dec.apply(params, jnp.asarray(x)))

    ref = oracle_decode_minsum(bg, Z, x, iters, cn_weight_per_iter=w, bias_per_iter=b)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_minsum_corrects_errors_at_high_snr():
    """End-to-end sanity: all-zero codeword through light AWGN decodes to zero
    under the STANDARD convention (bit0 -> +1, decision LLR<0)."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=8, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    rng = np.random.default_rng(7)
    sigma = 0.5  # ~6 dB for rate 3/4
    B = 16
    x_sym = 1.0 + sigma * rng.normal(size=(B, code.N, code.Z))
    llr = (2.0 * x_sym / sigma**2).astype(np.float32)
    assert (llr < 0).mean() > 0.01  # raw channel has bit errors
    bits = np.asarray(dec.decode_hard(dec.init_params(), jnp.asarray(llr)))
    assert bits.sum() == 0  # all corrected


def test_decoder_batch_size_is_dynamic():
    """The reference bakes batch_size into the module (SURVEY §3.2); ours must not."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(n_iterations=2))
    p = dec.init_params()
    for B in (1, 5):
        out = dec.apply(p, jnp.zeros((B, code.N, code.Z)))
        assert out.shape == (2, B, code.n_bits)


def test_target_iter_selection():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(n_iterations=4))
    p = dec.init_params()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, code.N, code.Z)).astype(np.float32))
    all_outs = dec(p, x)
    np.testing.assert_array_equal(np.asarray(dec(p, x, target_iter=2)), np.asarray(all_outs[2]))
    sel = dec(p, x, target_iter=[1, 3])
    np.testing.assert_array_equal(np.asarray(sel[0]), np.asarray(all_outs[1]))
    np.testing.assert_array_equal(np.asarray(sel[1]), np.asarray(all_outs[3]))


# ----------------------------------------------------------------------
# Differential parity vs the torch reference
# ----------------------------------------------------------------------

def _build_reference_model(torch, code, iters, B, sharing, decoder_type, qbit):
    from boosted_neural_ldpc_decoder.ConnectingMatrix import ConnectingMatrix
    from boosted_neural_ldpc_decoder.ConnectingMatrixTorch import ConnectingMatrixTorch
    from boosted_neural_ldpc_decoder.BoostedNeuralLDPCDecoder import BoostedNeuralLDPCDecoder
    from boosted_neural_ldpc_decoder.struct.DecoderType import DecoderType as RefDT
    from boosted_neural_ldpc_decoder.struct.NodeWeightSharingConfig import (
        NodeWeightSharingConfig as RefNWS,
    )

    conn = ConnectingMatrixTorch(
        ConnectingMatrix(Z=code.Z, basegraph=code.basegraph.copy()),
        device=torch.device("cpu"),
    )
    return BoostedNeuralLDPCDecoder(
        iter_node_counts=iters, batch_size=B, connecting_matrix=conn,
        node_weight_sharing_config=RefNWS(*sharing),
        decoding_type={"SP": RefDT.SP, "MS": RefDT.MS, "QMS": RefDT.QMS}[decoder_type],
        decoder_qms_qbit=qbit,
    )


PARITY_CASES = [
    # (code, decoder, (cn, ucn, vn) sharing, randomize, atol)
    ("wman_n576_r34_z24", "MS", (3, 0, 0), False, 5e-4),
    ("wman_n576_r34_z24", "MS", (1, 0, 0), True, 2e-3),
    ("wman_n576_r34_z24", "QMS", (3, 0, 3), True, 0.0),
    ("wman_n576_r34_z24", "SP", (2, 0, 0), True, 5e-3),
    ("nr_bg2_set0_z16", "QMS", (3, 0, 3), False, 0.0),
    ("nr_bg2_set0_z16", "QMS", (3, 3, 2), True, 0.0),
    ("nr_bg2_set0_z16", "MS", (2, 2, 0), True, 2e-3),
]


@pytest.mark.parametrize("code_name,dtype,sharing,randomize,atol", PARITY_CASES)
def test_boosted_parity_with_torch_reference(
    torch_reference, code_name, dtype, sharing, randomize, atol
):
    torch = torch_reference
    code = get_code(code_name)
    iters, B = 6, 4
    ref = _build_reference_model(torch, code, iters, B, sharing, dtype, qbit=5)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    cfg = BoostedDecoderConfig(
        n_iterations=iters,
        decoder_type={"SP": DecoderType.SP, "MS": DecoderType.MS, "QMS": DecoderType.QMS}[dtype],
        qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=sharing[0], ucn=sharing[1], vn=sharing[2]),
        convention=Convention.REFERENCE,
    )
    ours = BoostedNeuralDecoder(g, cfg)
    params = ours.init_params()

    rng = np.random.RandomState(42)
    if randomize:
        for key in ("cn", "ucn", "vn"):
            pk = f"weight_{key}"
            if pk not in params:
                continue
            w = rng.uniform(0.2, 1.9, size=params[pk].shape).astype(np.float32)
            params[pk] = jnp.asarray(w)
            for i in range(w.shape[0]):
                t = getattr(ref, f"weight_{key.upper()}_{i}")
                t.data = torch.tensor(w[i].reshape(t.shape))

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])
    our_outs = np.asarray(ours.apply(params, jnp.asarray(x)))

    err = np.abs(ref_outs - our_outs).max()
    if atol == 0.0:
        assert err == 0.0, f"QMS parity must be bit-exact, got {err}"
    else:
        assert err <= atol, f"max diff {err} > {atol}"


def test_neural_parity_with_torch_reference(torch_reference):
    torch = torch_reference
    from neural_ldpc_decoder.ConnectingMatrix import ConnectingMatrix
    from neural_ldpc_decoder.ConnectingMatrixTorch import ConnectingMatrixTorch
    from neural_ldpc_decoder.NeuralLDPCDecoder import NeuralLDPCDecoder

    code = get_code("wman_n576_r34_z24")
    iters, B = 5, 4
    conn = ConnectingMatrixTorch(
        ConnectingMatrix(Z=code.Z, basegraph=code.basegraph.copy()),
        device=torch.device("cpu"),
    )
    ref = NeuralLDPCDecoder(iter_node_counts=iters, batch_size=B, connecting_matrix=conn)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = NeuralMinSumDecoder(g, NeuralDecoderConfig(n_iterations=iters,
                                                     convention=Convention.REFERENCE))
    rng = np.random.RandomState(3)
    w = rng.uniform(0.2, 1.5, size=(iters, g.E)).astype(np.float32)
    b = rng.uniform(-0.3, 0.3, size=(iters, g.E)).astype(np.float32)
    for i in range(iters):
        ref.weights_var[i].data = torch.tensor(w[i])
        ref.biases_var[i].data = torch.tensor(b[i])
    params = {"weights_var": jnp.asarray(w), "biases_var": jnp.asarray(b)}

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])
    our_outs = np.asarray(dec.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(our_outs, ref_outs, atol=2e-3)


@pytest.mark.parametrize(
    "code_name,decoder_type,sharing,fixed",
    [
        ("wman_n576_r34_z24", DecoderType.MS, dict(cn=3, ucn=0, vn=0), ()),
        ("wman_n576_r34_z24", DecoderType.QMS, dict(cn=3, ucn=0, vn=3), ()),
        ("wman_n576_r34_z24", DecoderType.SP, dict(cn=1, ucn=0, vn=2), ()),
        ("wman_n576_r34_z24", DecoderType.MS, dict(cn=2, ucn=2, vn=3), ()),
        ("wman_n576_r34_z24", DecoderType.MS, dict(cn=5, ucn=4, vn=5), (2,)),
        ("nr_bg2_set0_z16", DecoderType.MS, dict(cn=3, ucn=2, vn=3), ()),
        ("nr_bg2_set0_z16", DecoderType.QMS, dict(cn=3, ucn=0, vn=3), ()),
    ],
)
def test_flat_routing_matches_edge_routing(code_name, decoder_type, sharing, fixed):
    """The TPU fast path (ops/flat.py one-hot MXU routing) must be numerically
    equivalent to the gather formulation (ops/bp.py) across decoder variants.
    SP tolerance is looser: arctanh near +-1 amplifies product-order noise."""
    code = get_code(code_name)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, code.N, code.Z)).astype(np.float32) * 3)
    kw = dict(
        n_iterations=4,
        decoder_type=decoder_type,
        qms_qbit=5,
        sharing=NodeWeightSharingConfig(**sharing),
        convention=Convention.STANDARD,
        fixed_iterative_nodes=fixed,
    )
    edge = BoostedNeuralDecoder(g, BoostedDecoderConfig(routing="edge", **kw))
    flat_ = BoostedNeuralDecoder(
        g, BoostedDecoderConfig(routing="flat", matmul_precision="highest", **kw)
    )
    params = edge.init_params()
    params = {
        k: v * (1 + 0.3 * jnp.asarray(rng.normal(size=v.shape).astype(np.float32)))
        for k, v in params.items()
    }
    oe = np.asarray(edge.apply(params, x))
    of = np.asarray(flat_.apply(params, x))
    atol = 5e-4 if decoder_type == DecoderType.SP else 2e-4
    np.testing.assert_allclose(of, oe, atol=atol)


def test_flat_cn_reduce_strategies_agree():
    """slot-matmul and gather CN reductions must agree (wman supports both)."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, code.N, code.Z)).astype(np.float32) * 3)
    kw = dict(n_iterations=4, decoder_type=DecoderType.MS,
              sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
              routing="flat", matmul_precision="highest")
    a = BoostedNeuralDecoder(g, BoostedDecoderConfig(cn_reduce="slot_matmul", **kw))
    b = BoostedNeuralDecoder(g, BoostedDecoderConfig(cn_reduce="gather", **kw))
    assert a.fa.Ts is not None and b.fa.Ts is None
    p = a.init_params()
    np.testing.assert_allclose(
        np.asarray(a.apply(p, x)), np.asarray(b.apply(p, x)), atol=1e-5
    )


@pytest.mark.slow
def test_flat_routing_is_differentiable():
    """Gradients must flow through the flat path (training uses it too)."""
    import jax

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3, decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3), routing="flat",
        ),
    )
    params = dec.init_params()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, code.N, code.Z)).astype(np.float32) * 3)

    def loss(p):
        return jnp.mean(jax.nn.sigmoid(dec.apply(p, x)[-1]))

    grads = jax.grad(loss)(params)
    for k, v in grads.items():
        assert np.all(np.isfinite(np.asarray(v))), k
        assert float(jnp.max(jnp.abs(v))) > 0, f"zero grad for {k}"


def test_neural_decoder_flat_matches_edge():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    rng = np.random.default_rng(5)
    kw = dict(n_iterations=6, convention=Convention.STANDARD)
    edge = NeuralMinSumDecoder(g, NeuralDecoderConfig(routing="edge", **kw))
    flat_ = NeuralMinSumDecoder(
        g, NeuralDecoderConfig(routing="flat", matmul_precision="highest", **kw)
    )
    params = {
        "weights_var": jnp.asarray(rng.uniform(0.2, 1.2, size=(6, g.E)).astype(np.float32)),
        "biases_var": jnp.asarray(rng.uniform(-0.2, 0.2, size=(6, g.E)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(4, code.N, code.Z)).astype(np.float32) * 3)
    np.testing.assert_allclose(
        np.asarray(flat_.apply(params, x)), np.asarray(edge.apply(params, x)), atol=2e-4
    )


@pytest.mark.slow
def test_degree_specific_sharing_mode():
    """SharingMode.DEGREE_ITER (framework extension, arXiv:2107.04221): one
    weight per distinct node degree per iteration.  With every class set to
    the same value it must equal the scalar ITER mode; classes must follow
    node degrees."""
    from neural_ldpc_tpu.structs import SharingMode

    code = get_code("nr_bg2_set0_z16")  # irregular: multiple distinct degrees
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    kw = dict(n_iterations=3, decoder_type=DecoderType.MS,
              convention=Convention.STANDARD, matmul_precision="highest")
    deg = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        sharing=NodeWeightSharingConfig(cn=SharingMode.DEGREE_ITER, ucn=0,
                                        vn=SharingMode.DEGREE_ITER), **kw))
    p = deg.init_params()
    assert p["weight_cn"].shape == (3, len(np.unique(g.cn_degree)))
    assert p["weight_vn"].shape == (3, len(np.unique(g.vn_degree)))

    scalar = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3), **kw))
    ps = scalar.init_params()
    ps = {k: v * 0.8 for k, v in ps.items()}
    p_const = {k: v * 0.8 for k, v in p.items()}

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(3, code.N, code.Z)).astype(np.float32) * 3)
    np.testing.assert_allclose(
        np.asarray(deg.apply(p_const, x)), np.asarray(scalar.apply(ps, x)), atol=1e-5
    )

    # distinct per-class values must produce degree-dependent edge weights
    import jax

    p2 = {k: v * jnp.arange(1, v.shape[1] + 1, dtype=jnp.float32)[None] for k, v in p.items()}
    cn_w, _, _ = deg._expanded_weights(p2)
    cn_w = np.asarray(cn_w)
    for e in range(g.E):
        d = g.cn_degree[g.cn_of_edge[e]]
        cls = int(np.searchsorted(np.unique(g.cn_degree), d))
        assert cn_w[0, e] == cls + 1

    # gradients flow (trains like any other mode)
    def loss(pp):
        return jnp.mean(jax.nn.sigmoid(deg.apply(pp, x)[-1]))

    grads = jax.grad(loss)(p)
    assert all(float(jnp.max(jnp.abs(v))) > 0 for v in grads.values())


# ----------------------------------------------------------------------
# QMS parity breadth: every quantizer mode the reference supports
# (Functions.py:29-83 — q_bit in {3, 4, 5, -5, 6}, clip-only, pass-through)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("qbit", [3, 4, -5, 6])
def test_qms_parity_all_qbits(torch_reference, qbit):
    """Decoder-level bit-exact parity for every QMS quantizer mode (round-1
    pinned only q_bit=5)."""
    torch = torch_reference
    code = get_code("wman_n576_r34_z24")
    iters, B = 5, 4
    ref = _build_reference_model(torch, code, iters, B, (3, 0, 3), "QMS", qbit=qbit)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    ours = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=iters, decoder_type=DecoderType.QMS, qms_qbit=qbit,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3),
        convention=Convention.REFERENCE,
    ))
    params = ours.init_params()
    rng = np.random.RandomState(17 + qbit)
    for key in ("cn", "vn"):
        w = rng.uniform(0.2, 1.9, size=params[f"weight_{key}"].shape).astype(np.float32)
        params[f"weight_{key}"] = jnp.asarray(w)
        for i in range(w.shape[0]):
            t = getattr(ref, f"weight_{key.upper()}_{i}")
            t.data = torch.tensor(w[i].reshape(t.shape))

    x = (rng.randn(B, code.N, code.Z) * 4).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])
    our_outs = np.asarray(ours.apply(params, jnp.asarray(x)))
    err = np.abs(ref_outs - our_outs).max()
    assert err == 0.0, f"q_bit={qbit} parity must be bit-exact, got {err}"


@pytest.mark.parametrize("qbit", [3, 4, 5, -5, 6, 99])
def test_quantizer_functions_match_torch(torch_reference, qbit):
    """cal_msa_q_torch / Cal_MSA_Q / qms_clipping_torch parity, including the
    unknown-q_bit pass-through branch (Functions.py:29-83)."""
    torch = torch_reference
    from boosted_neural_ldpc_decoder.Functions import Functions

    from neural_ldpc_tpu.ops.quantize import (
        qms_clip, qms_quantize_ste, qms_quantize_value,
    )

    x = np.linspace(-25.0, 25.0, 4001).astype(np.float32)
    ref_q = Functions.cal_msa_q_torch(torch.tensor(x), qbit).numpy()
    ref_qv = Functions.Cal_MSA_Q(x, qbit)
    ref_clip = Functions.qms_clipping_torch(torch.tensor(x), qbit).numpy()
    np.testing.assert_array_equal(np.asarray(qms_quantize_ste(jnp.asarray(x), qbit)), ref_q)
    np.testing.assert_array_equal(np.asarray(qms_quantize_value(x, qbit)), ref_qv)
    np.testing.assert_array_equal(np.asarray(qms_clip(jnp.asarray(x), qbit)), ref_clip)

    if qbit != 99:
        # STE gradient = clipped identity: 1 inside the clip range
        import jax

        g = jax.vmap(jax.grad(lambda v: qms_quantize_ste(v, qbit)))(jnp.asarray(x))
        lo, hi = float(ref_clip.min()), float(ref_clip.max())
        interior = (x > lo + 0.1) & (x < hi - 0.1)
        np.testing.assert_array_equal(np.asarray(g)[interior], 1.0)
        np.testing.assert_array_equal(np.asarray(g)[(x < lo - 0.1) | (x > hi + 0.1)], 0.0)


def test_sp_puncturing_end_to_end_parity(torch_reference):
    """SP decode of punctured words, datagen + decoder against the torch
    reference end-to-end: the 0.001 puncture path (AWGNPassedDatagen.py:110-114)
    must survive the tanh-domain check update identically."""
    torch = torch_reference
    from boosted_neural_ldpc_decoder.AWGNPassedDatagen import AWGNPassedDatagen
    from boosted_neural_ldpc_decoder.struct.DecoderType import DecoderType as RefDT
    from boosted_neural_ldpc_decoder.struct.Puncture import Puncture as RefPuncture

    from neural_ldpc_tpu.channel import ReferenceAWGNDatagen
    from neural_ldpc_tpu.structs import Puncture

    code = get_code("wman_n576_r34_z24")
    B, iters = 8, 4
    snrs = np.array([2.0, 3.0, 4.0])
    punct = (1, 24)  # first lifted block (1-based inclusive, reference style)

    ref_gen = AWGNPassedDatagen(
        N=code.N, M=code.M, snr_db=snrs,
        awgn_noise_seed=2042, wordgen_random_seed=1074,
        puncturing=RefPuncture(*punct),
    )
    x_ref, y_ref = ref_gen("mix_snr", B, code.Z, True, RefDT.SP, 5)

    our_gen = ReferenceAWGNDatagen(
        N=code.N, M=code.M, snr_db=snrs, puncturing=Puncture(*punct),
    )
    x_ours, y_ours = our_gen("mix_snr", B, code.Z, True, DecoderType.SP, 5)
    np.testing.assert_array_equal(x_ours, np.asarray(x_ref, np.float32))
    np.testing.assert_array_equal(y_ours, y_ref)
    assert (x_ours.reshape(B, -1)[:, :24] == 0.001).all()  # the SP puncture fill

    ref = _build_reference_model(torch, code, iters, B, (3, 0, 0), "SP", qbit=5)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    ours = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=iters, decoder_type=DecoderType.SP,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.REFERENCE,
    ))
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(np.asarray(x_ref, np.float32)))])
    our_outs = np.asarray(ours.apply(ours.init_params(), jnp.asarray(x_ours)))
    np.testing.assert_allclose(our_outs, ref_outs, atol=5e-3)


# ----------------------------------------------------------------------
# Temporal sharing (modes 4/5) + forward fixed_iter_weight parity
# (round-2 VERDICT missing item 2: reference :216-236, :264-334, :498-503)
# ----------------------------------------------------------------------

def _build_temporal_reference(torch, code, iters, B, sharing, fixed_nodes, qbit=5):
    from boosted_neural_ldpc_decoder.ConnectingMatrix import ConnectingMatrix
    from boosted_neural_ldpc_decoder.ConnectingMatrixTorch import ConnectingMatrixTorch
    from boosted_neural_ldpc_decoder.BoostedNeuralLDPCDecoder import BoostedNeuralLDPCDecoder
    from boosted_neural_ldpc_decoder.struct.DecoderType import DecoderType as RefDT
    from boosted_neural_ldpc_decoder.struct.NodeWeightSharingConfig import (
        NodeWeightSharingConfig as RefNWS,
    )

    conn = ConnectingMatrixTorch(
        ConnectingMatrix(Z=code.Z, basegraph=code.basegraph.copy()),
        device=torch.device("cpu"),
    )
    return BoostedNeuralLDPCDecoder(
        iter_node_counts=iters, batch_size=B, connecting_matrix=conn,
        node_weight_sharing_config=RefNWS(*sharing),
        decoding_type=RefDT.QMS, decoder_qms_qbit=qbit,
        fixed_iterative_nodes=list(fixed_nodes),
    )


def _temporal_setup(torch, use_override):
    """wman QMS decoder, CN sharing mode 4 (per-edge temporal) with fixed
    iterative nodes (0, 3): iterations 0-2 use the iteration-0 row, 3-5 the
    iteration-3 row (fetch_param's closest-fixed-<=i rule, reference
    :227-235).  With ``use_override`` iteration 3 additionally takes a
    forward-time ``fixed_iter_weight`` tensor (reference :498-503) — later
    iterations still use the REGISTERED row, not the override."""
    code = get_code("wman_n576_r34_z24")
    iters, B, fixed_nodes = 6, 4, (0, 3)
    ref = _build_temporal_reference(torch, code, iters, B, (4, 0, 0), fixed_nodes)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    ours = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=iters, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=4, ucn=0, vn=0),
        fixed_iterative_nodes=fixed_nodes,
        convention=Convention.REFERENCE,
    ))
    params = ours.init_params()
    assert params["weight_cn"].shape == (2, g.E)  # rows for iterations 0, 3

    rng = np.random.RandomState(11)
    w = rng.uniform(0.2, 1.9, size=(2, g.E)).astype(np.float32)
    params["weight_cn"] = jnp.asarray(w)
    ref.weight_CN_0.data = torch.tensor(w[0])
    ref.weight_CN_3.data = torch.tensor(w[1])

    ref_kw, our_kw = {}, {}
    if use_override:
        w3 = rng.uniform(0.2, 1.9, size=(g.E,)).astype(np.float32)
        ref_kw = dict(fixed_iter=[3], fixed_iter_weight=[torch.tensor(w3)])
        our_kw = dict(fixed_iter_weights={"cn": {3: jnp.asarray(w3)}})

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x), **ref_kw)])
    our_outs = np.asarray(ours.apply(params, jnp.asarray(x), **our_kw))
    return ref_outs, our_outs


@pytest.mark.parametrize("use_override", [False, True])
def test_temporal_mode4_parity_with_torch_reference(torch_reference, use_override):
    torch = torch_reference
    ref_outs, our_outs = _temporal_setup(torch, use_override)
    err = np.abs(ref_outs - our_outs).max()
    assert err == 0.0, f"QMS temporal-mode-4 parity must be bit-exact, got {err}"


def test_reference_vn_mode5_is_a_noop_quirk(torch_reference):
    """Reference quirk (verified by execution): VN sharing mode 5 registers
    per-node weights but forward applies VN weights only under modes 2/3/4
    (:327-334), so mode 5 decodes as if VN weighting were off.  Pin that, and
    pin that OUR NODE_TEMPORAL mode actually applies the weights (a deliberate
    fix — the registered parameters would otherwise be dead)."""
    torch = torch_reference
    code = get_code("wman_n576_r34_z24")
    iters, B, fixed_nodes = 4, 3, (0, 2)
    ref = _build_temporal_reference(torch, code, iters, B, (3, 0, 5), fixed_nodes)
    rng = np.random.RandomState(5)
    for i in range(iters):
        getattr(ref, f"weight_CN_{i}").data = torch.tensor(
            rng.uniform(0.5, 1.5, size=(1,)).astype(np.float32))
    # randomize the (dead) reference VN rows
    ref.weight_VN_0.data = torch.tensor(rng.uniform(0.2, 1.9, size=(code.N,)).astype(np.float32))
    ref.weight_VN_2.data = torch.tensor(rng.uniform(0.2, 1.9, size=(code.N,)).astype(np.float32))

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)

    def build(vn_mode):
        dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
            n_iterations=iters, decoder_type=DecoderType.QMS, qms_qbit=5,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=vn_mode),
            fixed_iterative_nodes=fixed_nodes if vn_mode else (),
            convention=Convention.REFERENCE,
        ))
        p = dec.init_params()
        p["weight_cn"] = jnp.asarray(np.stack(
            [np.asarray(getattr(ref, f"weight_CN_{i}").data) for i in range(iters)]))
        return dec, p

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])

    dec0, p0 = build(0)  # VN weighting off = what the reference actually does
    ours_off = np.asarray(dec0.apply(p0, jnp.asarray(x)))
    assert np.abs(ref_outs - ours_off).max() == 0.0

    dec5, p5 = build(5)  # our NODE_TEMPORAL really weights the channel
    p5["weight_vn"] = jnp.asarray(np.stack([
        np.asarray(ref.weight_VN_0.data), np.asarray(ref.weight_VN_2.data)]))
    ours_on = np.asarray(dec5.apply(p5, jnp.asarray(x)))
    assert np.abs(ours_on - ref_outs).max() > 0.0


def test_reference_cn4_ignores_ucn_quirk(torch_reference):
    """Reference quirk (verified by execution): the CN sharing-mode-4 branch
    has no UCN split (:498-503 vs :431-497), so (cn=4, ucn=4) decodes
    identically to (cn=4, ucn=0) no matter the UCN weights.  CN mode 5 and VN
    mode 4 are unrunnable in the reference (UnboundLocalError / shape
    mismatch) — our implementations of those are supersets by design."""
    torch = torch_reference
    code = get_code("wman_n576_r34_z24")
    iters, B, fixed_nodes = 4, 3, (0, 2)
    ref = _build_temporal_reference(torch, code, iters, B, (4, 4, 0), fixed_nodes)
    rng = np.random.RandomState(9)
    w = rng.uniform(0.2, 1.9, size=(2, ref.sum_edge)).astype(np.float32)
    ref.weight_CN_0.data = torch.tensor(w[0])
    ref.weight_CN_2.data = torch.tensor(w[1])
    ref.weight_UCN_0.data = torch.tensor(rng.uniform(0.2, 1.9, size=(ref.sum_edge,)).astype(np.float32))
    ref.weight_UCN_2.data = torch.tensor(rng.uniform(0.2, 1.9, size=(ref.sum_edge,)).astype(np.float32))

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    ours = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=iters, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=4, ucn=0, vn=0),
        fixed_iterative_nodes=fixed_nodes,
        convention=Convention.REFERENCE,
    ))
    params = ours.init_params()
    params["weight_cn"] = jnp.asarray(w)

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])
    our_outs = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert np.abs(ref_outs - our_outs).max() == 0.0
