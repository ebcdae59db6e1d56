"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY §4:
the capability gap vs the reference, closed with fake-device-count tests)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval import CampaignConfig, MonteCarloCampaign, count_errors
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.parallel import make_mesh, replicate, shard_batch
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training import TrainConfig, make_train_step


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8 and len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


@pytest.fixture(scope="module")
def setup():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0, 4.0)))
    return code, decoder, channel


@pytest.mark.slow
def test_sharded_decode_matches_single_device(mesh, setup):
    code, decoder, channel = setup
    params = decoder.init_params()
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(0), 16)
    ref = np.asarray(decoder.apply(params, llr))

    llr_sh = shard_batch(np.asarray(llr), mesh)
    params_r = replicate(params, mesh)
    out = np.asarray(jax.jit(decoder.apply)(params_r, llr_sh))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_sharded_error_counts_are_global(mesh, setup):
    code, decoder, channel = setup
    params = decoder.init_params()
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(1), 24)
    outputs = decoder.apply(params, llr)
    ref = count_errors(bits, outputs)

    c = jax.jit(
        lambda p, l, b: count_errors(b, decoder.apply(p, l))
    )(replicate(params, mesh), shard_batch(np.asarray(llr), mesh),
      shard_batch(np.asarray(bits), mesh))
    np.testing.assert_allclose(np.asarray(c.bit_errors), np.asarray(ref.bit_errors))
    np.testing.assert_allclose(np.asarray(c.frame_errors), np.asarray(ref.frame_errors))
    assert float(c.total_frames) == 24


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(mesh, setup):
    """Gradients psum'd over the mesh must equal the single-device update."""
    code, decoder, channel = setup
    cfg = TrainConfig(batch_size=16)
    init_opt, step_single = make_train_step(decoder, cfg)
    _, step_mesh = make_train_step(decoder, cfg, mesh=mesh)

    params = decoder.init_params()
    opt_state = init_opt(params)
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(2), 16)

    p1, _, l1 = step_single(params, opt_state, llr, bits, jnp.float32(1e-2))
    p2, _, l2 = step_mesh(
        replicate(params, mesh), replicate(opt_state, mesh),
        shard_batch(np.asarray(llr), mesh), shard_batch(np.asarray(bits), mesh),
        jnp.float32(1e-2),
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)  # psum reduce order
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        p1, p2,
    )


@pytest.mark.slow
def test_montecarlo_campaign_sharded_and_restartable(mesh, setup, tmp_path):
    code, decoder, channel = setup
    params = decoder.init_params()
    cfg = CampaignConfig(batch_size=32, max_words_per_snr=64, min_frame_errors=0,
                         checkpoint_dir=str(tmp_path))
    camp = MonteCarloCampaign(decoder, params, channel, cfg, mesh=mesh)
    res = camp.run(verbose=False)
    assert set(res) == {3.0, 4.0}
    assert res[3.0]["words"] == 64
    assert res[3.0]["ber"][-1] <= res[3.0]["ber"][0]

    # checkpoint round-trip restores counters exactly
    from neural_ldpc_tpu.utils import CheckpointManager
    ck = CheckpointManager(str(tmp_path))
    camp.save_state(ck)
    camp2 = MonteCarloCampaign(decoder, params, channel, cfg, mesh=mesh)
    camp2.restore_state(ck)
    assert np.array_equal(camp2.words, camp.words)
    np.testing.assert_array_equal(camp2.bit_errors, camp.bit_errors)


def test_campaign_run_snr_point_matches_run():
    """The incremental run_snr_point API accumulates the same counters as the
    whole-sweep run() driver for the same seed."""
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    params = dec.init_params()
    chan = AWGNChannel(code, ChannelConfig(snr_db=(2.0,)))
    cfg = CampaignConfig(batch_size=64, max_words_per_snr=256,
                         min_frame_errors=0, engine="xla", seed=5)

    a = MonteCarloCampaign(dec, params, chan, cfg)
    a.run(verbose=False)
    b = MonteCarloCampaign(dec, params, chan, cfg)
    b.run_snr_point(0, batches=2)
    b.run_snr_point(0, batches=2)
    assert int(b.words[0]) == int(a.words[0]) == 256
    np.testing.assert_array_equal(a.bit_errors, b.bit_errors)
    np.testing.assert_array_equal(a.frame_errors, b.frame_errors)
