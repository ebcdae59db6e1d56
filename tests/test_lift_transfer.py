"""Lift-transfer invariant: neural weights are BASEGRAPH-level quantities,
so the param pytree of a decoder on any lift Z of the same protograph is
identical — trained-at-one-lift weights apply verbatim at another.

This is the premise of the round-5 BG1 workflow (scripts/bg1_train_r5.py):
train at Z=256 on the fused tier, serve the full Z=384 lift.  The reference
has no cross-lift story at all — its ConnectingMatrix
(/root/reference/src/boosted_neural_ldpc_decoder/ConnectingMatrix.py:82-99)
bakes one Z into dense (EZ)^2 routing matrices and its per-iteration
nn.Parameters are created against that single graph.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from neural_ldpc_tpu.codes import TannerGraph
from neural_ldpc_tpu.codes.protograph import nr_bg1_like
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import (
    Convention, DecoderType, NodeWeightSharingConfig, SharingMode,
)

SHARINGS = {
    "iter": NodeWeightSharingConfig(
        cn=SharingMode.ITER, ucn=SharingMode.NONE, vn=SharingMode.NONE),
    "degree_iter": NodeWeightSharingConfig(
        cn=SharingMode.DEGREE_ITER, ucn=SharingMode.NONE, vn=SharingMode.ITER),
}


def _decoder(Z, sharing):
    code = nr_bg1_like(Z)
    g = TannerGraph.from_basegraph(code.basegraph, Z)
    return BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=5, decoder_type=DecoderType.MS, sharing=sharing,
        convention=Convention.STANDARD, routing="edge"))


@pytest.mark.parametrize("name", list(SHARINGS))
def test_param_pytree_identical_across_lifts(name):
    sharing = SHARINGS[name]
    shapes = {}
    for Z in (8, 16, 24):
        p = _decoder(Z, sharing).init_params()
        shapes[Z] = {k: np.shape(v) for k, v in p.items()}
    assert shapes[8] == shapes[16] == shapes[24]


def test_degree_classes_are_lift_invariant():
    """DEGREE_ITER classes come from node degrees, which lifting preserves —
    the class-of-node map must repeat per lift copy and have the same class
    count at every Z."""
    s8 = _decoder(8, SHARINGS["degree_iter"]).specs["cn"]
    s16 = _decoder(16, SHARINGS["degree_iter"]).specs["cn"]
    assert s8.n_degree_classes == s16.n_degree_classes
    # the graph keeps BASE dimensions (class-of-node is per base CN, [M]);
    # lifting preserves every base CN's degree, so the maps match exactly
    assert np.array_equal(
        np.asarray(s8.degree_class_of_node), np.asarray(s16.degree_class_of_node))


def test_trained_weights_transfer_and_change_decoding():
    """Weights perturbed at one lift load at another and steer the decode:
    the transferred decoder differs from weights=1 but keeps the sign
    structure on a clean high-SNR word (both decode it)."""
    src = _decoder(8, SHARINGS["iter"])
    p = src.init_params()
    trained = {k: v * 0.8 for k, v in p.items()}  # stand-in for training

    dst = _decoder(16, SHARINGS["iter"])
    rng = np.random.default_rng(5)
    sigma = 0.45
    llr = jnp.asarray(
        (2 * (1.0 + sigma * rng.normal(size=(8, dst.graph.N, 16))) / sigma**2)
        .astype(np.float32))
    out_base = np.asarray(dst.apply(dst.init_params(), llr)[-1])
    out_tr = np.asarray(dst.apply(trained, llr)[-1])
    assert not np.allclose(out_base, out_tr)  # weights actually applied
    assert (out_base > 0).all() and (out_tr > 0).all()  # both decode clean words
