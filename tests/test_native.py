"""Native C++ host runtime: GF(2) ops, counter-based AWGN, error counting.

Each native entry point is checked against an independent numpy computation,
and the C++ AWGN sampler against its bit-exact numpy mirror (the fallback
path), so the suite validates both implementations whether or not a compiler
is present.
"""

import numpy as np
import pytest

from neural_ldpc_tpu import native
from neural_ldpc_tpu.channel import ChannelConfig, HostDatagen
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.structs import Convention


@pytest.fixture(scope="module")
def bg2():
    code = get_code("nr_bg2_set0_z16")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    return code, graph


def test_pack_rows_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.integers(0, 2, size=(5, 130)).astype(np.uint8)
    packed = native.pack_rows(m)
    assert packed.shape == (5, 3)
    unpacked = (
        (packed[:, :, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).reshape(5, -1)[:, :130]
    np.testing.assert_array_equal(unpacked, m)


def test_gf2_encode_matches_numpy(bg2):
    code, _ = bg2
    G = code.gen_matrix
    rng = np.random.default_rng(1)
    info = rng.integers(0, 2, size=(37, G.shape[0])).astype(np.uint8)
    cw = native.gf2_encode(info, native.pack_rows(G), G.shape[1])
    expected = (info.astype(np.int64) @ G.astype(np.int64) % 2).astype(np.uint8)
    np.testing.assert_array_equal(cw, expected)


def test_gf2_syndrome_validates_codewords(bg2):
    code, graph = bg2
    G = code.gen_matrix
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, size=(16, G.shape[0])).astype(np.uint8)
    cw = native.gf2_encode(info, native.pack_rows(G), G.shape[1])
    hp = native.pack_rows(graph.lifted_parity_check_matrix())
    assert native.gf2_syndrome_ok(cw, hp, code.n_bits).all()
    bad = cw.copy()
    bad[:, 7] ^= 1
    assert not native.gf2_syndrome_ok(bad, hp, code.n_bits).any()


def test_awgn_native_matches_numpy_mirror(bg2):
    """The C++ splitmix64/Box-Muller sampler and the numpy fallback must be
    bit-identical (same counters, same arithmetic)."""
    if not native.available():
        pytest.skip("native library unavailable; only one path to compare")
    code, _ = bg2
    sigma = np.linspace(0.5, 1.2, 9)
    a = native.awgn_llr(None, sigma, code.n_bits, seed=123, word_offset=1000)
    lib, native._lib, native._tried = native._lib, None, True
    try:
        b = native.awgn_llr(None, sigma, code.n_bits, seed=123, word_offset=1000)
    finally:
        native._lib = lib
    np.testing.assert_array_equal(a, b)


def test_awgn_determinism_and_offset_invariance(bg2):
    """word_offset addressing: batch [100, 104) == tail of batch [96, 104)."""
    code, _ = bg2
    sig = np.full(8, 0.8)
    big = native.awgn_llr(None, sig, code.n_bits, seed=7, word_offset=96)
    small = native.awgn_llr(None, sig[:4], code.n_bits, seed=7, word_offset=100)
    np.testing.assert_array_equal(big[4:], small)
    again = native.awgn_llr(None, sig[:4], code.n_bits, seed=7, word_offset=100)
    np.testing.assert_array_equal(small, again)


def test_awgn_statistics(bg2):
    """LLR for all-zero @ sigma: mean 2/sigma^2, var 4/sigma^2."""
    code, _ = bg2
    sigma = 0.9
    llr = native.awgn_llr(None, np.full(2000, sigma), code.n_bits, seed=5)
    mean, var = 2.0 / sigma**2, 4.0 / sigma**2
    assert abs(llr.mean() - mean) < 0.02 * mean
    assert abs(llr.var() - var) < 0.03 * var


def test_count_errors(bg2):
    code, _ = bg2
    rng = np.random.default_rng(3)
    llr = rng.normal(size=(11, code.n_bits)).astype(np.float32)
    expected = rng.integers(0, 2, size=(11, code.n_bits)).astype(np.uint8)
    be, fe, mask = native.count_errors(llr, expected)
    bits = (llr < 0).astype(np.uint8)
    errs = (bits != expected).sum(axis=1)
    assert be == int(errs.sum())
    assert fe == int((errs > 0).sum())
    np.testing.assert_array_equal(mask, errs > 0)


def test_host_datagen_resumable_and_valid(bg2):
    code, graph = bg2
    dg = HostDatagen(code, ChannelConfig(snr_db=(2.0, 4.0)), seed=11)
    b0 = dg.batch(0, 6, all_zero=False)
    assert b0.llr.shape == (6, code.N, code.Z)
    # codewords satisfy H
    assert dg.verify_codewords(b0.bits, graph).all()
    # resumability: re-request overlapping window
    b1 = dg.batch(2, 4, all_zero=False)
    np.testing.assert_array_equal(b0.bits[2:], b1.bits)
    np.testing.assert_array_equal(b0.llr[2:], b1.llr)


def test_host_datagen_matches_device_convention(bg2):
    """Host all-zero LLR under STANDARD convention is centered on +2/sigma^2
    (bit 0 -> +1); REFERENCE convention flips the sign."""
    code, _ = bg2
    std = HostDatagen(code, ChannelConfig(snr_db=(3.0,)), seed=1).batch(0, 200)
    assert std.llr.mean() > 0
    ref = HostDatagen(
        code, ChannelConfig(snr_db=(3.0,), convention=Convention.REFERENCE), seed=1
    ).batch(0, 200)
    assert ref.llr.mean() < 0


@pytest.mark.slow
def test_host_datagen_feeds_trainer(bg2):
    """The native host channel can drive the training loop end to end."""
    import jax.numpy as jnp

    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.training import TrainConfig, Trainer

    code, graph = bg2
    dec = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    dg = HostDatagen(code, ChannelConfig(snr_db=(2.0, 4.0)), seed=5)
    trainer = Trainer(
        dec, __import__("neural_ldpc_tpu.channel", fromlist=["AWGNChannel"]).AWGNChannel(
            code, ChannelConfig(snr_db=(2.0, 4.0))),
        TrainConfig(total_epochs=2, batch_size=16, train_words_per_epoch=32,
                    validate_words=16, validate_epoch_step=2, checkpoint_step=10**9,
                    log_metrics_step=10**9, progress_step=10**9,
                    checkpoint_dir="/tmp/native_train_ckpt",
                    export_weights_txt=False, verbose=False),
        host_datagen=dg.as_train_datagen(all_zero=True),
    )
    params, _, info = trainer.train()
    assert np.isfinite(info["best_loss"])
    # weights moved off init
    assert float(jnp.abs(params["weight_cn"] - 1.0).max()) > 0
