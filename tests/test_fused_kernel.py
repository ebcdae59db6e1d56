"""Fused Pallas min-sum kernel: differential tests against the XLA flat path
(interpret mode on CPU — exact f32 arithmetic, no MXU rounding)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig

pytestmark = pytest.mark.slow  # heavy lane: run with `pytest -m slow`


def _build(code_name, **cfg_kw):
    code = get_code(code_name)
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g, BoostedDecoderConfig(matmul_precision="highest", **cfg_kw)
    )
    return code, g, dec


@pytest.mark.parametrize(
    "code_name,decoder_type,sharing",
    [
        ("wman_n576_r34_z24", DecoderType.MS, dict(cn=3, ucn=0, vn=0)),
        ("wman_n576_r34_z24", DecoderType.QMS, dict(cn=2, ucn=0, vn=3)),
        ("nr_bg2_set0_z16", DecoderType.MS, dict(cn=1, ucn=0, vn=2)),
        ("nr_bg2_set0_z16", DecoderType.QMS, dict(cn=3, ucn=0, vn=3)),
    ],
)
def test_fused_matches_flat(code_name, decoder_type, sharing):
    code, g, dec = _build(
        code_name,
        n_iterations=4,
        decoder_type=decoder_type,
        qms_qbit=5,
        sharing=NodeWeightSharingConfig(**sharing),
    )
    rng = np.random.default_rng(0)
    params = dec.init_params()
    params = {
        k: v * (1 + 0.2 * jnp.asarray(rng.normal(size=v.shape).astype(np.float32)))
        for k, v in params.items()
    }
    x = jnp.asarray(rng.normal(size=(5, code.N, code.Z)).astype(np.float32) * 4)
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, routing_dtype=jnp.float32, interpret=True, bt=8
    )
    ref = np.asarray(dec.apply(params, x)[-1])
    out = np.asarray(fused(x))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_batch_padding():
    """Batches that are not a multiple of the tile must round-trip unchanged."""
    code, g, dec = _build(
        "wman_n576_r34_z24",
        n_iterations=3,
        decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
    )
    params = dec.init_params()
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, routing_dtype=jnp.float32, interpret=True, bt=8
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(11, code.N, code.Z)).astype(np.float32) * 4)
    out = fused(x)
    assert out.shape == (11, code.n_bits)
    # first 8 words (one full tile) must equal the same words decoded alone
    np.testing.assert_allclose(
        np.asarray(fused(x[:8])), np.asarray(out[:8]), atol=1e-6
    )


def test_fused_sp_matches_flat():
    """Sum-product (tanh-domain) check update inside the fused kernel."""
    code, g, dec = _build(
        "wman_n576_r34_z24",
        n_iterations=4,
        decoder_type=DecoderType.SP,
        sharing=NodeWeightSharingConfig(cn=1, ucn=0, vn=2),
    )
    rng = np.random.default_rng(4)
    params = dec.init_params()
    params = {
        k: v * (1 + 0.2 * jnp.asarray(rng.normal(size=v.shape).astype(np.float32)))
        for k, v in params.items()
    }
    x = jnp.asarray(rng.normal(size=(5, code.N, code.Z)).astype(np.float32) * 3)
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, routing_dtype=jnp.float32, interpret=True, bt=8
    )
    assert fused.meta.sum_product
    ref = np.asarray(dec.apply(params, x)[-1])
    # atanh near +-1 amplifies product-order noise; decisions must agree
    out = np.asarray(fused(x))
    np.testing.assert_allclose(out, ref, atol=5e-3)
    np.testing.assert_array_equal(out < 0, ref < 0)


def test_fused_rejects_sp_qms_combo():
    with pytest.raises(ValueError, match="mutually exclusive"):
        code = get_code("wman_n576_r34_z24")
        g = TannerGraph.from_basegraph(code.basegraph, code.Z)
        FusedMinsumDecoder(g, n_iterations=3, qms_qbit=5, sum_product=True)


@pytest.mark.parametrize("decoder_type", [DecoderType.MS, DecoderType.QMS])
def test_fused_ucn_matches_flat(decoder_type):
    """UCN (unsatisfied-check) weighting inside the fused kernel must match
    the flat path, including the iteration-0 channel-APP special case."""
    code, g, dec = _build(
        "wman_n576_r34_z24",
        n_iterations=4,
        decoder_type=decoder_type,
        qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=2, ucn=2, vn=3),
    )
    rng = np.random.default_rng(3)
    params = dec.init_params()
    params = {
        k: v * (1 + 0.3 * jnp.asarray(rng.normal(size=v.shape).astype(np.float32)))
        for k, v in params.items()
    }
    assert "weight_ucn" in params
    # low-ish LLRs so some checks actually come out unsatisfied
    x = jnp.asarray(rng.normal(size=(6, code.N, code.Z)).astype(np.float32) * 2)
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, routing_dtype=jnp.float32, interpret=True, bt=8
    )
    assert fused.meta.has_ucn
    ref = np.asarray(dec.apply(params, x)[-1])
    np.testing.assert_allclose(np.asarray(fused(x)), ref, atol=1e-4)


def test_montecarlo_fused_engine_matches_xla():
    """Same campaign via the fused engine (interpret mode) and the XLA engine
    must produce statistically identical final-iteration counts (identical
    words: same keys, same channel)."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3,
            decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
            matmul_precision="highest",
        ),
    )
    params = dec.init_params()
    channel = AWGNChannel(code, ChannelConfig(snr_db=(4.0,)))
    kw = dict(batch_size=64, max_words_per_snr=128, min_frame_errors=0, seed=9)
    mc_x = MonteCarloCampaign(dec, params, channel, CampaignConfig(engine="xla", **kw))
    rx = mc_x.run(verbose=False)[4.0]
    mc_f = MonteCarloCampaign(dec, params, channel, CampaignConfig(engine="fused", **kw))
    assert mc_f.fused
    rf = mc_f.run(verbose=False)[4.0]
    assert rf["final_iter_only"]
    assert rf["words"] == rx["words"]
    # final-iteration BER identical up to f32 noise at decision boundaries
    assert abs(rf["ber"][-1] - rx["ber"][-1]) < 1e-4
    assert abs(rf["fer"][-1] - rx["fer"][-1]) < 1e-3


def test_emit_syndrome_matches_xla_syndrome():
    """The in-kernel syndrome flag must equal the XLA syndrome of the same
    final APP (vmem and hbm store modes)."""
    from neural_ldpc_tpu.eval.two_stage import make_syndrome_ok
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=2, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    rng = np.random.default_rng(5)
    # mid-noise so some words satisfy the syndrome and some don't
    llr = jnp.asarray(rng.normal(loc=5.0, scale=2.7, size=(32, g.N, 8)).astype(np.float32))
    syn_xla = make_syndrome_ok(g)
    for space in ("vmem", "hbm"):
        f = FusedMinsumDecoder.from_decoder(
            dec, params, interpret=True, emit_syndrome=True, bt=8,
            store_space=space)
        app, ok = f(llr)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(syn_xla(app)))
    assert 0 < int(np.asarray(ok).sum()) < 32  # both populations present


def test_emit_stats_matches_host_counts():
    """Stats-only decode (ok/bit-errors/frame-error, no APP output) must
    match counts computed from the full APP (all-zero convention)."""
    from neural_ldpc_tpu.eval.two_stage import make_syndrome_ok
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 8)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=2, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    rng = np.random.default_rng(6)
    llr = jnp.asarray(rng.normal(loc=5.0, scale=2.7, size=(32, g.N, 8)).astype(np.float32))
    app = FusedMinsumDecoder.from_decoder(dec, params, interpret=True, bt=8)(llr)
    ok_ref = np.asarray(make_syndrome_ok(g)(app))
    err_ref = np.asarray(app) < 0
    for space in ("vmem", "hbm"):
        f = FusedMinsumDecoder.from_decoder(
            dec, params, interpret=True, emit_stats=True, bt=8,
            store_space=space)
        ok, be, fe = f(llr)
        np.testing.assert_array_equal(np.asarray(ok), ok_ref)
        np.testing.assert_array_equal(np.asarray(be), err_ref.sum(axis=1))
        np.testing.assert_array_equal(np.asarray(fe), err_ref.any(axis=1))


def test_montecarlo_early_exit_counters_match_full():
    """Syndrome-gated early exit (round 4): counters must equal the
    full-unroll fused campaign on identical words — accepted words keep
    their phase-1 decisions, failures are re-decoded with the full unroll,
    and an overflowing batch is re-done exactly by drain()."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=4,
            decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
            matmul_precision="highest",
        ),
    )
    params = dec.init_params()
    # 3 dB: a mix of phase-1 accepts and escalations at I1=2; guard off so
    # the EE path runs unconditionally (the auto-guard is timing-based)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    kw = dict(batch_size=64, max_words_per_snr=256, min_frame_errors=0, seed=11,
              early_exit_auto_guard=False)
    r_full = MonteCarloCampaign(
        dec, params, channel, CampaignConfig(engine="fused", **kw)
    ).run(verbose=False)[3.0]
    mc_ee = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(engine="fused", early_exit_iters=2, **kw),
    )
    assert mc_ee.ee
    r_ee = mc_ee.run(verbose=False)[3.0]
    assert r_ee["words"] == r_full["words"] == 256
    assert r_ee["ber"] == r_full["ber"]
    assert r_ee["fer"] == r_full["fer"]

    # tiny capacity: every failing batch overflows -> exact redo path
    mc_of = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(engine="fused", early_exit_iters=2,
                       early_exit_capacity=1, **kw),
    )
    r_of = mc_of.run(verbose=False)[3.0]
    assert r_of["ber"] == r_full["ber"]
    assert r_of["fer"] == r_full["fer"]


def test_montecarlo_early_exit_auto_guard():
    """The auto-guard probes EE vs exact once per SNR point, folds the probe
    batches' counters in (no wasted words), and records a decision; either
    outcome must leave the counters exact."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    mc = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(engine="fused", early_exit_iters=2, batch_size=64,
                       max_words_per_snr=10 * 64, min_frame_errors=0, seed=11,
                       early_exit_probe_batches=1),
    )
    r = mc.run(verbose=False)[3.0]
    assert 0 in mc._ee_choice  # the probe ran and recorded a decision
    # probe words are folded in: 2 variants x (1 warm + 1 timed) = 4 batches,
    # then the run loop tops up to the budget
    assert r["words"] == 10 * 64
    assert r["fer"][-1] >= 0


def test_montecarlo_early_exit_on_mesh():
    """Round 5 (VERDICT r4 item 5): early exit composes with the device mesh
    — shard-local compaction, psum'd counts, pmax'd escalation flag — and the
    counters equal the mesh full-unroll step on identical words, including
    the per-shard-overflow exact-redo path."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.parallel import make_mesh

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    mesh = make_mesh(8)
    kw = dict(batch_size=64, max_words_per_snr=256, min_frame_errors=0,
              seed=11, engine="fused", early_exit_auto_guard=False)
    r_full = MonteCarloCampaign(
        dec, params, channel, CampaignConfig(**kw), mesh=mesh
    ).run(verbose=False)[3.0]
    mc_ee = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(early_exit_iters=2, **kw), mesh=mesh,
    )
    assert mc_ee.ee and mc_ee._ee_step is not None
    r_ee = mc_ee.run(verbose=False)[3.0]
    assert r_ee["words"] == r_full["words"] == 256
    assert r_ee["ber"] == r_full["ber"]
    assert r_ee["fer"] == r_full["fer"]

    # capacity 1 per shard: overflow -> mesh exact redo on the same keys
    mc_of = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(early_exit_iters=2, early_exit_capacity=1, **kw),
        mesh=mesh,
    )
    r_of = mc_of.run(verbose=False)[3.0]
    assert r_of["ber"] == r_full["ber"]
    assert r_of["fer"] == r_full["fer"]


def test_montecarlo_fused_mesh():
    """Fused engine under a shard_map over the 8-device CPU mesh: counts are
    psum-reduced across shards and totals must equal the requested words."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.parallel import make_mesh

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3,
            decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        ),
    )
    params = dec.init_params()
    # low SNR so errors definitely occur and the psum has something to add
    channel = AWGNChannel(code, ChannelConfig(snr_db=(0.0,)))
    mc = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(batch_size=64, max_words_per_snr=128,
                       min_frame_errors=0, seed=3, engine="fused"),
        mesh=make_mesh(8),
    )
    assert mc.fused
    r = mc.run(verbose=False)[0.0]
    assert r["words"] == 128
    assert r["ber"][-1] > 0  # 0 dB: plain MS cannot clean everything
    assert 0 < r["fer"][-1] <= 1


def test_fused_all_iterations_matches_flat():
    """all_iterations=True must reproduce decoder.apply's full [I, B, N*Z]."""
    code, g, dec = _build(
        "wman_n576_r34_z24",
        n_iterations=4,
        decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
    )
    params = dec.init_params()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(5, code.N, code.Z)).astype(np.float32) * 4)
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, routing_dtype=jnp.float32, interpret=True, bt=8,
        all_iterations=True,
    )
    out = np.asarray(fused(x))
    ref = np.asarray(dec.apply(params, x))
    assert out.shape == ref.shape == (4, 5, code.n_bits)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_montecarlo_fused_per_iteration_stats():
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3,
            decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        ),
    )
    channel = AWGNChannel(code, ChannelConfig(snr_db=(1.0,)))
    mc = MonteCarloCampaign(
        dec, dec.init_params(), channel,
        CampaignConfig(batch_size=32, max_words_per_snr=64, min_frame_errors=0,
                       seed=5, engine="fused", fused_all_iterations=True),
    )
    r = mc.run(verbose=False)[1.0]
    assert not r["final_iter_only"]
    assert len(r["ber"]) == 3
    # genuine per-iteration statistics: all populated, in range, not all equal
    # (plain min-sum at 1 dB is not monotone across iterations — no such claim)
    assert all(0 < b < 0.5 for b in r["ber"])
    assert len(set(r["ber"])) > 1


def test_two_stage_decoder():
    """Two-stage decode: syndrome routing accepts stage-1 successes and
    escalates failures; with an 'oracle' post stage the system fixes exactly
    the escalated words."""
    import jax

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.two_stage import TwoStageDecoder

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3, decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        ),
    )
    p = dec.init_params()
    base_decode = jax.jit(lambda x: dec.apply(p, x)[-1])
    # oracle post stage: returns the true (all-zero) codeword APP
    oracle = lambda x: jnp.full((x.shape[0], code.n_bits), 5.0)  # noqa: E731

    channel = AWGNChannel(code, ChannelConfig(snr_db=(1.5,)))
    llr, bits = channel.sample_at(jax.random.PRNGKey(2), 128, 0)

    ts = TwoStageDecoder(g, base_decode, oracle)
    app, used_post = ts(llr)
    stats = ts.decode_with_fallback_stats(llr, bits)
    assert stats["frames"] == 128
    assert stats["base_frame_errors"] > 0  # 1.5 dB: base must fail sometimes
    # syndrome-escalation is a superset of true frame errors (undetected
    # errors are valid codewords — none expected at this block length/SNR)
    assert stats["escalated"] >= stats["base_frame_errors"]
    # oracle post stage clears every escalated word
    assert stats["system_frame_errors"] == 0
    # words not escalated keep the base output bit-for-bit
    keep = ~np.asarray(used_post)
    base_app = np.asarray(base_decode(llr))
    np.testing.assert_array_equal(np.asarray(app)[keep], base_app[keep])


def test_fused_rejects_reference_convention():
    from neural_ldpc_tpu.structs import Convention

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3, decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
            convention=Convention.REFERENCE,
        ),
    )
    with pytest.raises(ValueError, match="STANDARD-convention"):
        FusedMinsumDecoder.from_decoder(dec, dec.init_params())
    # and the campaign must not auto-select it either
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    mc = MonteCarloCampaign(
        dec, dec.init_params(),
        AWGNChannel(code, ChannelConfig(snr_db=(4.0,), convention=Convention.REFERENCE)),
        CampaignConfig(batch_size=8, max_words_per_snr=8, min_frame_errors=0),
    )
    assert not mc.fused


def test_fused_decoder_odd_z_delegates_to_streaming_kernel():
    """Z % 8 != 0 decodes through the streaming kernel (round 1 raised)."""
    import jax.numpy as jnp
    import numpy as np

    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, 12)  # Z=12, not sublane-aligned
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        matmul_precision="highest"))
    params = dec.init_params()
    fused = FusedMinsumDecoder.from_decoder(
        dec, params, interpret=True, routing_dtype=jnp.float32)
    assert fused._delegate is not None
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, g.N, 12)).astype(np.float32) * 3)
    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(dec.apply(params, x)[-1]), atol=2e-5)


def test_two_stage_sparse_matches_dense():
    """decode_sparse (post decoder only on escalated rows) must produce the
    same outputs as the dense two-stage call, including when nothing fails."""
    import jax

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.two_stage import TwoStageDecoder

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    p = dec.init_params()
    base_decode = jax.jit(lambda x: dec.apply(p, x)[-1])
    post_decode = jax.jit(lambda x: dec.apply(p, x)[-1] * 2.0)  # distinguishable

    ts = TwoStageDecoder(g, base_decode, post_decode)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(1.5, 6.0)))

    # noisy batch: some escalations
    llr, _ = channel.sample_at(jax.random.PRNGKey(2), 64, 0)
    app_dense, used_dense = ts(llr)
    app_sparse, used_sparse = ts.decode_sparse(llr, min_post_batch=8)
    np.testing.assert_array_equal(np.asarray(used_sparse), np.asarray(used_dense))
    assert np.asarray(used_sparse).sum() > 0
    np.testing.assert_allclose(np.asarray(app_sparse), np.asarray(app_dense), atol=1e-6)

    # clean batch: no escalations, post decoder never invoked
    llr2, _ = channel.sample_at(jax.random.PRNGKey(3), 32, 1)
    app2, used2 = ts.decode_sparse(llr2)
    assert np.asarray(used2).sum() == 0
    np.testing.assert_array_equal(np.asarray(app2), np.asarray(base_decode(llr2)))


def test_legacy_engine_delegation_warns():
    """engine='legacy' must warn (not silently switch) when the config forces
    delegation to the stream kernel (round-2 ADVICE: a caller benchmarking
    the legacy kernel could silently get stream numbers)."""
    import warnings

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=2, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        f = FusedMinsumDecoder.from_decoder(
            dec, params, engine="legacy", all_iterations=True, interpret=True
        )
    assert f._delegate is not None
    assert any("delegates to the stream kernel" in str(w.message) for w in rec)
    with pytest.raises(ValueError):
        FusedMinsumDecoder.from_decoder(dec, params, engine="nonsense")


def test_fused_capacity_helper_frontier():
    """fused_capacity_ok admits the hardware-proven BG1-scale Z=128 decode
    AND the full Z=384 lift for MS decode (round 5: lane-honest HBM estimate
    at the bt=128 floor), gates QMS at Z=384 out (two extra per-VN windows
    exceed VMEM), and still rejects genuinely oversized codes."""
    from neural_ldpc_tpu.ops.pallas.fused_train import fused_capacity_ok

    rng = np.random.default_rng(0)
    M, N = 46, 68
    bg = np.full((M, N), -1, np.int64)
    for m in range(M):
        bg[m, m] = rng.integers(0, 383)
        bg[m, M + (m % (N - M))] = rng.integers(0, 383)
        if m > 0:
            bg[m, m - 1] = rng.integers(0, 383)
        for c in rng.choice(N - M, size=rng.integers(3, 8), replace=False):
            bg[m, M + c] = rng.integers(0, 383)
    assert fused_capacity_ok(TannerGraph.from_basegraph(bg, 128))
    assert fused_capacity_ok(TannerGraph.from_basegraph(bg, 384))
    assert not fused_capacity_ok(TannerGraph.from_basegraph(bg, 384), qms=True)
    # beyond the per-VN window budget at the 128-lane floor
    assert not fused_capacity_ok(TannerGraph.from_basegraph(bg, 1536))


def test_bg1_full_lift_decode_constructs():
    """The shipped nr_bg1_like code at its FULL Z=384 lift constructs a fused
    decode (HBM-streamed messages) at the lane-honest bt=128 floor — sub-128
    tiles lane-pad back to 128 so they buy no VMEM (round-5 fix)."""
    from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder

    code = get_code("nr_bg1_like_z384")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=0, ucn=0, vn=0)))
    ft = FusedTrainDecoder.from_decoder(dec, store_msgs=False,
                                        stream_outputs=False, interpret=True)
    assert ft.meta.hbm_store
    assert ft.bt == 128


@pytest.mark.slow
def test_fused_sample_channel_kernel():
    """In-kernel AWGN sampling (round 5): counter-hash + Box-Muller inside
    the stats kernel.  Pure-jnp uint32 hashing means the interpret-mode
    stream IS the TPU stream: check moments, determinism, seed sensitivity,
    and that re-decoding the EMITTED llr through the normal stats kernel
    reproduces the counters exactly (the early-exit escalation contract)."""
    from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=5, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    p = dec.init_params()
    cw, uw, vw = dec._expanded_weights(p)
    ft = FusedTrainDecoder.from_decoder(
        dec, store_msgs=False, stream_outputs=False, emit_stats=True,
        sample_channel=True, emit_chan=True, interpret=True, bt=8)
    sigma = 0.5
    (ok, be, fe), llr = ft.apply_sampled(
        cw, uw, vw, jnp.int32(1234), jnp.float32(sigma), 64)
    llr = np.asarray(llr)
    assert abs(llr.mean() - 2 / sigma**2) < 0.1      # E[llr] = 2/sigma^2
    assert abs(llr.std() - 2 / sigma) < 0.05          # std = 2/sigma
    n = (llr * sigma**2 / 2 - 1) / sigma              # implied noise
    assert abs(float(((n - n.mean()) ** 4).mean() / n.std() ** 4) - 3) < 0.15
    (_, _, _), llr2 = ft.apply_sampled(
        cw, uw, vw, jnp.int32(1234), jnp.float32(sigma), 64)
    assert np.array_equal(llr, np.asarray(llr2))      # deterministic
    (_, _, _), llr3 = ft.apply_sampled(
        cw, uw, vw, jnp.int32(99), jnp.float32(sigma), 64)
    assert not np.array_equal(llr, np.asarray(llr3))  # seed-sensitive
    fs = FusedTrainDecoder.from_decoder(
        dec, store_msgs=False, stream_outputs=False, emit_stats=True,
        interpret=True, bt=8)
    ok4, be4, fe4 = fs.apply(cw, uw, vw, jnp.asarray(llr))
    assert np.array_equal(np.asarray(ok), np.asarray(ok4))
    assert np.array_equal(np.asarray(be), np.asarray(be4))
    assert np.array_equal(np.asarray(fe), np.asarray(fe4))


@pytest.mark.slow
def test_montecarlo_kernel_sampling_counters():
    """Campaigns with kernel_channel_sampling: deterministic per seed, and
    the EE step's counters equal the sampled full unroll on IDENTICAL
    in-kernel-sampled words (including the capacity-overflow redo)."""
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0,)))
    kw = dict(batch_size=64, max_words_per_snr=256, min_frame_errors=0,
              seed=11, engine="fused", early_exit_auto_guard=False,
              kernel_channel_sampling="on")
    mc_full = MonteCarloCampaign(dec, params, channel, CampaignConfig(**kw))
    assert mc_full.kernel_sampling
    r_full = mc_full.run(verbose=False)[3.0]
    assert r_full["words"] == 256 and r_full["fer"][-1] > 0
    # deterministic across a rebuild with the same seed
    r_again = MonteCarloCampaign(
        dec, params, channel, CampaignConfig(**kw)).run(verbose=False)[3.0]
    assert r_again["ber"] == r_full["ber"] and r_again["fer"] == r_full["fer"]
    # EE on the SAME sampled words: counters exactly equal
    r_ee = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(early_exit_iters=2, **kw)).run(verbose=False)[3.0]
    assert r_ee["ber"] == r_full["ber"] and r_ee["fer"] == r_full["fer"]
    # overflow: every failing batch redone exactly by the sampled full step
    r_of = MonteCarloCampaign(
        dec, params, channel,
        CampaignConfig(early_exit_iters=2, early_exit_capacity=1, **kw)
    ).run(verbose=False)[3.0]
    assert r_of["ber"] == r_full["ber"] and r_of["fer"] == r_full["fer"]
    # statistically consistent with the threefry path at the same SNR
    kw2 = dict(kw, kernel_channel_sampling="off", max_words_per_snr=4096)
    r_xla = MonteCarloCampaign(
        dec, params, channel, CampaignConfig(**kw2)).run(verbose=False)[3.0]
    assert r_xla["fer"][-1] > 0  # same regime; exact values differ by stream
