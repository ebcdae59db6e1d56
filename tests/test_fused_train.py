"""Differential tests for the fused Pallas training tier (custom VJP).

Values AND gradients of ops/pallas/fused_train.py must match the XLA flat
path (ops/flat.py, precision="highest") under JAX's exact tie conventions
(clip boundaries 0.5, min-reduction tie splits, first-occurrence argmin).
Runs on CPU in interpret mode with f32 routing so the comparison is exact up
to f32 summation-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder, build_layout
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training.loss import multi_iteration_loss

# The default fast lane keeps one cheap value+grad parity case per routing
# mode so a kernel regression fails `pytest -q` (ADVICE r3); the heavy
# parametrizations and end-to-end cases run in the slow lane.
slow = pytest.mark.slow


def _setup(code_name, n_iter, dec_type, sharing, seed=0, B=32):
    code = get_code(code_name)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    cfg = BoostedDecoderConfig(
        n_iterations=n_iter, decoder_type=dec_type, sharing=sharing,
        matmul_precision="highest",
    )
    dec = BoostedNeuralDecoder(g, cfg)
    rng = np.random.default_rng(seed)
    params = {
        k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
        for k, v in dec.init_params().items()
    }
    sigma = 0.7
    llr = jnp.asarray(
        (2 * (1.0 + sigma * rng.standard_normal((B, code.N, code.Z))) / sigma**2).astype(np.float32)
    )
    bits = jnp.zeros((B, code.N * code.Z), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(dec, interpret=True, routing_dtype=jnp.float32)
    return dec, ft, params, llr, bits


CASES = [
    ("wman_n576_r34_z24", 5, DecoderType.MS, NodeWeightSharingConfig(cn=3, ucn=0, vn=0)),
    ("wman_n576_r34_z24", 4, DecoderType.MS, NodeWeightSharingConfig(cn=1, ucn=0, vn=2)),
    ("nr_bg2_set0_z16", 4, DecoderType.QMS, NodeWeightSharingConfig(cn=3, ucn=0, vn=3)),
    ("nr_bg2_set0_z16", 3, DecoderType.QMS, NodeWeightSharingConfig(cn=3, ucn=2, vn=0)),
]
FAST_CASES = [pytest.param(*c, marks=slow) for c in CASES]


@pytest.mark.parametrize("routing", [pytest.param("matmul", marks=slow), "roll"])
def test_fused_train_grad_parity_fast(routing):
    """Fast-lane value+grad parity smoke (ADVICE r3): one cheap wman case on
    the production (roll) routing so `pytest -q` catches kernel grad
    regressions; matmul routing and the full matrix run in the slow lane.
    (Interpret-mode trace overhead dominates, so one case ≈ 30 s.)"""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)  # relift at Z=8: cheap
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=2),
        matmul_precision="highest"))
    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(8, g.N, 8)).astype(np.float32) * 4)
    bits = jnp.zeros((8, g.N * 8), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing=routing, routing_dtype=jnp.float32)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    np.testing.assert_allclose(
        np.asarray(ft.apply(cn_w, ucn_w, vn_w, llr)),
        np.asarray(dec.apply(params, llr)), atol=2e-5)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=[0, 1, 2])

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=[0, 1, 2])

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


@pytest.mark.parametrize("code_name,n_iter,dec_type,sharing", FAST_CASES)
def test_fused_train_matches_flat(code_name, n_iter, dec_type, sharing):
    dec, ft, params, llr, bits = _setup(code_name, n_iter, dec_type, sharing)
    coeffs = list(range(n_iter))

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=coeffs)

    def loss_fused(p):
        cn_w, ucn_w, vn_w = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cn_w, ucn_w, vn_w, llr), bits, coeff=coeffs)

    o_flat = dec.apply(params, llr)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    o_fused = ft.apply(cn_w, ucn_w, vn_w, llr)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_flat), atol=2e-5)

    lf, gf = jax.value_and_grad(loss_flat)(params)
    lk, gk = jax.value_and_grad(loss_fused)(params)
    assert abs(float(lf) - float(lk)) < 1e-6
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gk[k])
        np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


def test_fused_train_hbm_store_grad_parity_fast():
    """Fast-lane smoke for the big-code HBM-streamed mode (round 4): message
    state + adjoint carry live in HBM and stream per degree-class chunk; the
    tiny relift forces store_space='hbm' so values AND grads stay pinned to
    the XLA path in the default lane."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=2),
        matmul_precision="highest"))
    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(8, g.N, 8)).astype(np.float32) * 4)
    bits = jnp.zeros((8, g.N * 8), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing="roll", store_space="hbm", bt=8)
    assert ft.meta.hbm_store and len(ft.meta.chunks) >= 1
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    np.testing.assert_allclose(
        np.asarray(ft.apply(cn_w, ucn_w, vn_w, llr)),
        np.asarray(dec.apply(params, llr)), atol=2e-5)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=[0, 1, 2])

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=[0, 1, 2])

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


@pytest.mark.parametrize("code_name,n_iter,dec_type,sharing", FAST_CASES)
def test_fused_train_hbm_store_matches_flat(code_name, n_iter, dec_type, sharing):
    """Full-size HBM-streamed training parity (values + grads) vs the XLA
    flat path, forced onto small codes via store_space='hbm'."""
    dec, _, params, llr, bits = _setup(code_name, n_iter, dec_type, sharing)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing="roll", store_space="hbm", bt=16)
    assert ft.meta.hbm_store
    coeffs = list(range(n_iter))

    o_flat = dec.apply(params, llr)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    o_fused = ft.apply(cn_w, ucn_w, vn_w, llr)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_flat), atol=2e-5)

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=coeffs)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=coeffs)

    lf, gf = jax.value_and_grad(loss_flat)(params)
    lk, gk = jax.value_and_grad(loss_fused)(params)
    assert abs(float(lf) - float(lk)) < 1e-6
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


@pytest.mark.parametrize("sharing", [
    NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
    pytest.param(NodeWeightSharingConfig(cn=1, ucn=0, vn=2), marks=slow),
    pytest.param(NodeWeightSharingConfig(cn=3, ucn=2, vn=0), marks=slow),
])
def test_fused_train_sum_product_grads(sharing):
    """SP (tanh-domain) training on the fused tier (round 4, VERDICT item
    8): values and gradients vs the XLA flat path.  The flat exclude-self
    product uses jnp.cumprod (log-depth scan) where the kernel reverses
    sequential chains, so agreement is to roundoff, not bitwise."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.SP, sharing=sharing,
        matmul_precision="highest"))
    rng = np.random.default_rng(2)
    params = {k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(8, g.N, 8)).astype(np.float32) * 4)
    bits = jnp.zeros((8, g.N * 8), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing="roll", routing_dtype=jnp.float32)
    assert ft.meta.sum_product and ft.meta.store_msgs
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    np.testing.assert_allclose(
        np.asarray(ft.apply(cn_w, ucn_w, vn_w, llr)),
        np.asarray(dec.apply(params, llr)), atol=3e-5)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=[0, 1, 2])

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=[0, 1, 2])

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=2e-6, rtol=2e-4, err_msg=f"grad {k}")


@slow
def test_fused_train_sum_product_hbm():
    """SP training parity in the HBM-streamed store mode."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.SP,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        matmul_precision="highest"))
    rng = np.random.default_rng(3)
    params = {k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(8, g.N, 8)).astype(np.float32) * 4)
    bits = jnp.zeros((8, g.N * 8), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing="roll", store_space="hbm", bt=8)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=[0, 1, 2])

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=[0, 1, 2])

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=2e-6, rtol=2e-4, err_msg=f"grad {k}")


def test_fused_decode_hbm_bitexact_vs_vmem():
    """HBM-streamed decode (store_msgs=False, one carry slot) is bit-identical
    to the VMEM-resident fused decode."""
    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, 8)  # relift: cheap interpret
    cfg = BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        matmul_precision="highest")
    dec = BoostedNeuralDecoder(g, cfg)
    params = dec.init_params()
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(size=(8, g.N, 8)).astype(np.float32) * 4)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    kw = dict(interpret=True, routing="roll", bt=8,
              store_msgs=False, stream_outputs=False)
    o_vmem = FusedTrainDecoder.from_decoder(dec, store_space="vmem", **kw).apply(
        cn_w, ucn_w, vn_w, llr)
    o_hbm = FusedTrainDecoder.from_decoder(dec, store_space="hbm", **kw).apply(
        cn_w, ucn_w, vn_w, llr)
    np.testing.assert_array_equal(np.asarray(o_hbm), np.asarray(o_vmem))


def test_layout_covers_all_edges():
    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    edge_perm, deg_classes, R = build_layout(g)
    assert sorted(edge_perm.tolist()) == list(range(g.E))
    assert sum(n for _, n in deg_classes) == g.M
    degs = np.diff(g.row_ptr)
    assert sum(d * n for d, n in deg_classes) == int(degs.sum()) == g.E
    # every real (edge, z) column routes to exactly one VN copy; pads to none
    Zp = -(-g.Z // 8) * 8
    cols = R.reshape(R.shape[0], g.E, Zp)
    assert np.all(cols[:, :, : g.Z].sum(axis=0) == 1.0)
    assert np.all(cols[:, :, g.Z:].sum(axis=0) == 0.0)


@slow
def test_fused_train_odd_z():
    """Z not a multiple of 8 (the round-1 kernel required Z % 8 == 0)."""
    code = get_code("wman_n576_r34_z24")
    bg = code.basegraph
    Z = 12  # wman shifts are mod-Z'd at load; relift the same protograph
    g = TannerGraph.from_basegraph(bg, Z)
    cfg = BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        matmul_precision="highest",
    )
    dec = BoostedNeuralDecoder(g, cfg)
    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(np.asarray(v) + 0.05 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(16, g.N, Z)).astype(np.float32) * 4)
    bits = jnp.zeros((16, g.N * Z), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(dec, interpret=True, routing_dtype=jnp.float32)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    o_fused = ft.apply(cn_w, ucn_w, vn_w, llr)
    o_flat = dec.apply(params, llr)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_flat), atol=2e-5)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=[0, 1, 2])

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=[0, 1, 2])

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


@slow
def test_train_step_fused_engine_runs():
    """make_train_step(engine='fused') takes optimizer steps that reduce loss."""
    from neural_ldpc_tpu.training.train_loop import TrainConfig, make_train_step

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    # interpret-mode kernel for the CPU test environment
    import neural_ldpc_tpu.ops.pallas.fused_train as ftmod
    orig = ftmod.FusedTrainDecoder.from_decoder

    def patched(decoder, **kw):
        kw.setdefault("interpret", True)
        kw.setdefault("routing_dtype", jnp.float32)
        return orig(decoder, **kw)

    ftmod.FusedTrainDecoder.from_decoder = staticmethod(patched)
    try:
        init_opt, step = make_train_step(dec, TrainConfig(batch_size=16, engine="fused"))
        params = dec.init_params()
        opt = init_opt(params)
        rng = np.random.default_rng(0)
        sigma = 0.9
        llr = jnp.asarray((2 * (1.0 + sigma * rng.standard_normal((16, code.N, code.Z))) / sigma**2).astype(np.float32))
        bits = jnp.zeros((16, code.N * code.Z), jnp.float32)
        losses = []
        for _ in range(5):
            params, opt, loss = step(params, opt, llr, bits, jnp.float32(0.05))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))
    finally:
        ftmod.FusedTrainDecoder.from_decoder = staticmethod(orig)


@pytest.mark.parametrize(
    "code_name,n_iter,dec_type,sharing",
    [pytest.param(*c, marks=slow) for c in (CASES[0], CASES[2], CASES[3])],
)
def test_fused_train_roll_routing_matches_flat(code_name, n_iter, dec_type, sharing):
    """VPU roll-based routing (no one-hot operand): values and gradients must
    match the flat XLA path exactly like the matmul mode does."""
    dec, _, params, llr, bits = _setup(code_name, n_iter, dec_type, sharing)
    ft = FusedTrainDecoder.from_decoder(dec, interpret=True, routing="roll")
    assert ft.meta.routing == "roll" and not ft.meta.int8_routing
    coeffs = list(range(n_iter))

    o_flat = dec.apply(params, llr)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    o_fused = ft.apply(cn_w, ucn_w, vn_w, llr)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_flat), atol=2e-5)

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=coeffs)

    def loss_fused(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits, coeff=coeffs)

    gf = jax.grad(loss_flat)(params)
    gk = jax.grad(loss_fused)(params)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gf[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")


@slow
def test_fused_train_roll_routing_odd_z():
    """Roll routing with Z % 8 != 0 (rotation restricted to the valid Z rows)."""
    code = get_code("wman_n576_r34_z24")
    Z = 12
    g = TannerGraph.from_basegraph(code.basegraph, Z)
    cfg = BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        matmul_precision="highest")
    dec = BoostedNeuralDecoder(g, cfg)
    rng = np.random.default_rng(4)
    params = {k: jnp.asarray(np.asarray(v) + 0.05 * rng.standard_normal(v.shape).astype(np.float32))
              for k, v in dec.init_params().items()}
    llr = jnp.asarray(rng.normal(size=(8, g.N, Z)).astype(np.float32) * 3)
    ft = FusedTrainDecoder.from_decoder(dec, interpret=True, routing="roll")
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    np.testing.assert_allclose(
        np.asarray(ft.apply(cn_w, ucn_w, vn_w, llr)),
        np.asarray(dec.apply(params, llr)), atol=2e-5)


@pytest.mark.parametrize("int8", [pytest.param(False, marks=slow),
                                  pytest.param(True, marks=slow)])
def test_fused_train_matmul_routing_grads(int8):
    """Gradient parity for explicit routing='matmul' (ADVICE r2: the auto
    picker chooses roll for every shipped code, so the matmul VJP — incl. the
    int8 saturation-boundary mask — was never grad-tested).  High channel
    LLRs force saturated VN totals, exercising the int8 pre-clip path whose
    backward mask must still match the XLA semantics (strictly-beyond-boundary
    = mask 0, not 0.5)."""
    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    sharing = NodeWeightSharingConfig(cn=3, ucn=0, vn=3)
    cfg = BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.QMS, sharing=sharing,
        matmul_precision="highest",
    )
    dec = BoostedNeuralDecoder(g, cfg)
    rng = np.random.default_rng(7)
    params = {
        k: jnp.asarray(np.asarray(v) + 0.1 * rng.standard_normal(v.shape).astype(np.float32))
        for k, v in dec.init_params().items()
    }
    sigma = 0.35  # LLR scale 2/sigma^2 ~ 16: totals saturate the +-2*q_hi clip
    llr = jnp.asarray(
        (2 * (1.0 + sigma * rng.standard_normal((16, code.N, code.Z))) / sigma**2).astype(np.float32)
    )
    bits = jnp.zeros((16, code.N * code.Z), jnp.float32)
    ft = FusedTrainDecoder.from_decoder(
        dec, interpret=True, routing="matmul", routing_dtype=jnp.float32,
        int8_routing=int8,
    )
    assert ft.meta.routing == "matmul" and ft.meta.int8_routing == int8
    coeffs = [0, 1, 2]

    def loss_flat(p):
        return multi_iteration_loss(dec.apply(p, llr), bits, coeff=coeffs)

    def loss_fused(p):
        cn_w, ucn_w, vn_w = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cn_w, ucn_w, vn_w, llr), bits, coeff=coeffs)

    o_flat = dec.apply(params, llr)
    cn_w, ucn_w, vn_w = dec._expanded_weights(params)
    o_fused = ft.apply(cn_w, ucn_w, vn_w, llr)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_flat), atol=2e-5)

    lf, gf = jax.value_and_grad(loss_flat)(params)
    lk, gk = jax.value_and_grad(loss_fused)(params)
    assert abs(float(lf) - float(lk)) < 1e-6
    for k in gf:
        a, b = np.asarray(gf[k]), np.asarray(gk[k])
        np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-4, err_msg=f"grad {k}")
