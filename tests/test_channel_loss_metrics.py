"""Channel generator, loss, and metrics tests (incl. reference differentials)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig, ReferenceAWGNDatagen
from neural_ldpc_tpu.codes import get_code
from neural_ldpc_tpu.eval import count_errors, evaluate_ber_fer
from neural_ldpc_tpu.ops.quantize import qms_quantize_ste, qms_quantize_value
from neural_ldpc_tpu.structs import Clipping, Convention, DecoderType, LossType, Puncture, Shortening
from neural_ldpc_tpu.training import LearningRate, multi_iteration_loss


# ----------------------------------------------------------------- channel
def test_channel_llr_statistics():
    code = get_code("wman_n576_r34_z24")
    ch = AWGNChannel(code, ChannelConfig(snr_db=(4.0,), convention=Convention.STANDARD))
    llr, bits = ch.sample_at(jax.random.PRNGKey(0), 512, 0)
    assert llr.shape == (512, code.N, code.Z) and bits.shape == (512, code.n_bits)
    assert bits.sum() == 0  # all-zero
    # E[LLR | bit 0, standard] = 2/sigma^2 > 0
    sigma = ch.sigma[0]
    mean = float(np.asarray(llr).mean())
    np.testing.assert_allclose(mean, 2.0 / sigma**2, rtol=0.05)


def test_channel_random_codewords_satisfy_parity():
    code = get_code("nr_bg2_set0_z16")
    from neural_ldpc_tpu.codes import TannerGraph

    H = TannerGraph.from_basegraph(code.basegraph, code.Z).lifted_parity_check_matrix()
    ch = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    _, bits = ch.sample_at(jax.random.PRNGKey(1), 16, 0, all_zero=False)
    bits = np.asarray(bits).astype(np.int64)
    assert bits.sum() > 0
    assert ((H.astype(np.int64) @ bits.T) % 2).sum() == 0


def test_channel_randcw_traced_generator_path():
    """sample_randcw_at_sigma passes the generator as a traced jit argument
    (BG1-scale generators cannot be embedded as trace constants — awgn.py
    ``_gen_matrix`` note): codewords satisfy H, and the LLR statistics match
    the constant-embedding ``sample`` path at the same sigma."""
    code = get_code("nr_bg2_set0_z16")
    from neural_ldpc_tpu.codes import TannerGraph

    H = TannerGraph.from_basegraph(code.basegraph, code.Z).lifted_parity_check_matrix()
    ch = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    llr, bits = ch.sample_randcw_at_sigma(jax.random.PRNGKey(7), 64, float(ch.sigma[0]))
    bits = np.asarray(bits).astype(np.int64)
    assert bits.sum() > 0
    assert ((H.astype(np.int64) @ bits.T) % 2).sum() == 0
    # LLR | bit: mean ~ +-2/sigma^2 under the STANDARD convention
    llr = np.asarray(llr).reshape(64, -1)
    s2 = float(ch.sigma[0]) ** 2
    np.testing.assert_allclose(llr[bits == 0].mean(), 2.0 / s2, rtol=0.05)
    np.testing.assert_allclose(llr[bits == 1].mean(), -2.0 / s2, rtol=0.05)


def test_channel_puncture_shorten_and_qms():
    code = get_code("wman_n576_r34_z24")
    cfg = ChannelConfig(
        snr_db=(3.0,), qms_qbit=5,
        puncture=Puncture(1, 24), shortening=Shortening(553, 576),
        convention=Convention.REFERENCE,
        # the reference's column/bit rate formula is degenerate for real bit
        # ranges (see CodeSpec.code_rate docstring) — pin the rate
        rate_override=0.75,
    )
    ch = AWGNChannel(code, cfg)
    llr, _ = ch.sample_at(jax.random.PRNGKey(2), 8, 0)
    flat = np.asarray(llr).reshape(8, -1)
    assert np.all(flat[:, :24] == 0.0)  # punctured
    assert np.all(flat[:, 552:576] == -20.0)  # shortened (reference sign)
    mid = flat[:, 24:552]
    assert np.all(np.abs(mid) <= 7.5) and np.allclose(mid * 2, np.round(mid * 2))


def test_channel_matches_reference_datagen_statistically():
    """Our on-device generator and the reference-semantics host generator
    produce the same LLR distribution (mean/var per SNR slot)."""
    code = get_code("wman_n576_r34_z24")
    snrs = (2.0, 4.0)
    ch = AWGNChannel(code, ChannelConfig(snr_db=snrs, convention=Convention.REFERENCE))
    ref = ReferenceAWGNDatagen(N=code.N, M=code.M, snr_db=np.asarray(snrs))
    n = 2000
    ours, _ = ch.sample_mixed(jax.random.PRNGKey(3), n)
    theirs, _ = ref("mix_snr", n, code.Z)
    ours, theirs = np.asarray(ours).reshape(n, -1), theirs.reshape(n, -1)
    for slot in range(len(snrs)):
        a, b = ours[slot::2], theirs[slot::2]
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)
        np.testing.assert_allclose(a.std(), b.std(), rtol=0.05)


def test_reference_datagen_matches_torch_reference_exactly(torch_reference):
    """Byte-level parity of the host generator with the upstream datagen."""
    from boosted_neural_ldpc_decoder.AWGNPassedDatagen import AWGNPassedDatagen as UpDatagen
    from boosted_neural_ldpc_decoder.struct.DecoderType import DecoderType as RefDT
    from boosted_neural_ldpc_decoder.struct.Puncture import Puncture as RefP
    from boosted_neural_ldpc_decoder.struct.Shortening import Shortening as RefS
    from boosted_neural_ldpc_decoder.struct.Clipping import Clipping as RefC

    code = get_code("nr_bg2_set0_z16")
    snrs = np.array([2.0, 3.0, 4.0])
    up = UpDatagen(N=code.N, M=code.M, snr_db=snrs, gen_matrix=code.gen_matrix,
                   puncturing=RefP(0, 0), shortening=RefS(0, 0), allowed_llr_range=RefC(abs=20.0))
    ours = ReferenceAWGNDatagen(N=code.N, M=code.M, snr_db=snrs, gen_matrix=code.gen_matrix)
    for gentype in ("mix_snr", "per_snr"):
        x_up, y_up = up(gentype, 7, code.Z, False, RefDT.QMS, 5)
        x_us, y_us = ours(gentype, 7, code.Z, False, DecoderType.QMS, 5)
        np.testing.assert_array_equal(np.asarray(x_us, np.float64), np.asarray(x_up, np.float64))
        np.testing.assert_array_equal(y_us, y_up)


# ----------------------------------------------------------------- quantize
def test_qms_quantize_grid():
    x = jnp.asarray([-100.0, -7.74, -7.76, 0.24, 0.26, 3.3, 100.0])
    q = qms_quantize_value(x, 5)
    np.testing.assert_allclose(np.asarray(q), [-7.5, -7.5, -7.5, 0.0, 0.5, 3.5, 7.5])
    # STE forward equals pure quantize; gradient is the clipped-identity's
    f = lambda v: qms_quantize_ste(v, 5).sum()
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [0, 0, 0, 1, 1, 1, 0], atol=1e-6)


def test_qms_quantizer_matches_torch_reference(torch_reference):
    torch = torch_reference
    from boosted_neural_ldpc_decoder.Functions import Functions

    rng = np.random.default_rng(0)
    x = (rng.normal(size=2048) * 8).astype(np.float32)
    for q in (6, 5, -5, 4, 3, 0):
        ref = Functions.cal_msa_q_torch(torch.tensor(x), q).numpy()
        ours = np.asarray(qms_quantize_ste(jnp.asarray(x), q))
        np.testing.assert_array_equal(ours, ref)


# ----------------------------------------------------------------- loss
def test_loss_matches_torch_reference(torch_reference):
    torch = torch_reference
    from boosted_neural_ldpc_decoder.LDPCDecoderLoss import LDPCDecoderLoss
    from boosted_neural_ldpc_decoder.struct.LossType import LossType as RefLT

    rng = np.random.default_rng(1)
    I, B, NZ = 5, 4, 48
    outputs = rng.normal(size=(I, B, NZ)).astype(np.float32) * 4
    labels = rng.integers(0, 2, size=(B, NZ)).astype(np.float32)
    coeffs = list(range(I))
    for lt_ref, lt_us, lbl in [
        (RefLT.BCE, LossType.BCE, labels),
        (RefLT.SoftBEROnAllZero, LossType.SoftBEROnAllZero, np.zeros_like(labels)),
        (RefLT.FEROnAllZero, LossType.FEROnAllZero, np.zeros_like(labels)),
    ]:
        for etha in (1.0, 0.8, 1.2):
            crit = LDPCDecoderLoss(loss_type=lt_ref, etha=etha)
            ref = crit([torch.tensor(o) for o in outputs], torch.tensor(lbl), coeffs).item()
            ours = float(multi_iteration_loss(
                jnp.asarray(outputs), jnp.asarray(lbl), lt_us, etha, coeffs,
                convention=Convention.REFERENCE))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_loss_gradients_match_torch_reference(torch_reference):
    torch = torch_reference
    from boosted_neural_ldpc_decoder.LDPCDecoderLoss import LDPCDecoderLoss
    from boosted_neural_ldpc_decoder.struct.LossType import LossType as RefLT

    rng = np.random.default_rng(2)
    I, B, NZ = 3, 2, 24
    outputs = rng.normal(size=(I, B, NZ)).astype(np.float32)
    labels = rng.integers(0, 2, size=(B, NZ)).astype(np.float32)
    t = torch.tensor(outputs, requires_grad=True)
    crit = LDPCDecoderLoss(loss_type=RefLT.BCE, etha=0.9)
    crit(list(t), torch.tensor(labels), list(range(I))).backward()
    ref_grad = t.grad.numpy()
    ours_grad = np.asarray(jax.grad(
        lambda o: multi_iteration_loss(o, jnp.asarray(labels), LossType.BCE, 0.9,
                                       list(range(I)), Convention.REFERENCE)
    )(jnp.asarray(outputs)))
    np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-4, atol=1e-7)


def test_loss_standard_convention_flips_logits():
    out = jnp.asarray(np.full((1, 2, 4), 5.0, np.float32))
    zeros = jnp.zeros((2, 4))
    # standard: +5 LLR means confident bit 0 -> tiny BCE against all-zero
    l_std = float(multi_iteration_loss(out, zeros, LossType.BCE,
                                       convention=Convention.STANDARD))
    l_ref = float(multi_iteration_loss(out, zeros, LossType.BCE,
                                       convention=Convention.REFERENCE))
    assert l_std < 0.01 < l_ref


# ----------------------------------------------------------------- metrics
def test_count_errors_and_reference_shape():
    outputs = jnp.asarray(np.array([
        [[1.0, -1.0, 1.0, -1.0]],  # iter 0: bits (std) = 0,1,0,1
        [[1.0, 1.0, 1.0, 1.0]],    # iter 1: all 0
    ], np.float32))
    expected = jnp.zeros((1, 4))
    (be, bits), (fe, frames) = evaluate_ber_fer(expected, outputs)
    assert be == [2.0, 0.0] and bits == 4
    assert fe == [1.0, 0.0] and frames == 1


def test_count_errors_matches_torch_reference(torch_reference):
    torch = torch_reference
    from boosted_neural_ldpc_decoder.Functions import Functions

    rng = np.random.default_rng(3)
    outputs = rng.normal(size=(4, 8, 32)).astype(np.float32)
    expected = rng.integers(0, 2, size=(8, 32)).astype(np.float32)
    (be_r, bits_r), (fe_r, fr_r) = Functions.evaluate_ber_fer(
        torch.tensor(expected), [torch.tensor(o) for o in outputs])
    (be, bits), (fe, fr) = evaluate_ber_fer(
        expected, outputs, convention=Convention.REFERENCE,
        emulate_reference_decision=True)
    assert be == be_r and bits == bits_r and fe == fe_r and fr == fr_r


# ----------------------------------------------------------------- lr
def test_learning_rate_step_decay():
    lr = LearningRate(1.0, 0.5, 3)
    vals = [lr() for _ in range(7)]
    # decays on the 3rd call (returning pre-decay value), again on the 6th
    assert vals == [1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.25]
    flat = LearningRate(0.1, 0.0, 0)
    assert [flat() for _ in range(3)] == [0.1, 0.1, 0.1]
