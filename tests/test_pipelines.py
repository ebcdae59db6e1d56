"""Greedy per-layer training and the two-stage boosted error-floor pipeline."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import (
    BoostedDecoderConfig,
    BoostedNeuralDecoder,
    NeuralDecoderConfig,
    NeuralMinSumDecoder,
)
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training import LearningRate, TrainConfig
from neural_ldpc_tpu.training.boosted_pipeline import BoostedPipeline, BoostedPipelineConfig
from neural_ldpc_tpu.training.greedy import GreedyLayerTrainer, GreedyTrainConfig

pytestmark = pytest.mark.slow  # heavy lane: run with `pytest -m slow`


def test_greedy_layer_training_moves_only_trained_layers():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = NeuralMinSumDecoder(graph, NeuralDecoderConfig(n_iterations=3))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(6.0, 4.0, 3.0)))
    trainer = GreedyLayerTrainer(dec, channel, GreedyTrainConfig(
        total_epochs=1, batch_size=16, verbose=False))
    params0 = dec.init_params()
    # run only layer 1 manually through the step
    opt = trainer.init_optimizer_state(params0)
    llr, bits = channel.sample_at(jax.random.PRNGKey(0), 16, 1)
    p1, opt, loss = trainer._step(params0, opt, llr, bits, jnp.int32(1))
    w0, w1 = np.asarray(params0["weights_var"]), np.asarray(p1["weights_var"])
    assert np.array_equal(w1[0], w0[0]) and np.array_equal(w1[2], w0[2])
    assert np.abs(w1[1] - w0[1]).max() > 0
    assert float(opt["t"][1]) == 1.0 and float(opt["t"][0]) == 0.0


def test_greedy_training_reduces_losses():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = NeuralMinSumDecoder(graph, NeuralDecoderConfig(n_iterations=4))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(6.0, 5.0, 4.0, 3.0)))
    trainer = GreedyLayerTrainer(dec, channel, GreedyTrainConfig(
        total_epochs=8, batch_size=32, verbose=False))
    params, _, report = trainer.train()
    assert all(np.isfinite(report["layer_losses"]))
    w = np.asarray(params["weights_var"])
    assert np.abs(w - 0.5).max() > 1e-3  # weights actually moved


def test_greedy_rejects_wrong_curriculum_length():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = NeuralMinSumDecoder(graph, NeuralDecoderConfig(n_iterations=4))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(6.0, 5.0)))
    with pytest.raises(ValueError, match="curriculum"):
        GreedyLayerTrainer(dec, channel)


def test_boosted_pipeline_end_to_end(tmp_path):
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    base_cfg = BoostedDecoderConfig(
        n_iterations=3, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(3.0, 4.0)))
    mk = lambda: TrainConfig(
        total_epochs=1, batch_size=16, train_words_per_epoch=64, validate_words=32,
        validate_epoch_step=1, checkpoint_step=1, checkpoint_dir=str(tmp_path),
        verbose=False, is_y_all_zero=True, learning_rate=LearningRate(1e-3, 0, 0))
    pipe = BoostedPipeline(
        graph, channel, base_cfg, mk(), mk(),
        BoostedPipelineConfig(base_iters=3, post_iters=2, collect_words=64,
                              collect_batch_size=64, collect_snr_index=0,
                              max_collect_batches=50),
    )
    base_params, ext_params, report = pipe.run(verbose=False)
    assert report["collected_words"] > 0
    # base rows transferred and frozen
    np.testing.assert_array_equal(
        np.asarray(ext_params["weight_cn"])[:3], np.asarray(base_params["weight_cn"]))
    assert ext_params["weight_cn"].shape == (5, 1)
    # post stage trains ONLY the UCN weights (post_train_ucn_only default):
    # CN/VN post rows stay at their neutral init, UCN post rows move
    assert np.abs(np.asarray(ext_params["weight_cn"])[3:] - 1.0).max() == 0
    assert "weight_ucn" in ext_params
    # frozen base UCN rows are seeded from the base CN scalars
    np.testing.assert_allclose(
        np.asarray(ext_params["weight_ucn"])[:3],
        np.broadcast_to(np.asarray(base_params["weight_cn"]),
                        np.asarray(ext_params["weight_ucn"])[:3].shape))
    assert np.abs(np.asarray(ext_params["weight_ucn"])[3:] - 1.0).max() > 0


def test_pipeline_collect_finds_real_failures():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    base_cfg = BoostedDecoderConfig(
        n_iterations=2, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0,)))
    cfg = TrainConfig(batch_size=8, verbose=False, is_y_all_zero=True)
    pipe = BoostedPipeline(graph, channel, base_cfg, cfg, cfg,
                           BoostedPipelineConfig(base_iters=2, post_iters=1,
                                                 collect_words=32,
                                                 collect_batch_size=64,
                                                 collect_snr_index=0))
    params = pipe.base_decoder.init_params()
    llr, bits = pipe.collect_uncorrected_words(params, verbose=False)
    # every collected word must actually fail the base decoder
    out = pipe.base_decoder.apply(params, jnp.asarray(llr))[-1]
    decided = (np.asarray(out) < 0).astype(np.int64)
    assert ((decided != bits.astype(np.int64)).any(axis=1)).all()


def test_greedy_fer_loss_variant():
    """FER-aware greedy training (round-1 weak spot: BCE greedy hurt FER)."""
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import NeuralMinSumDecoder
    from neural_ldpc_tpu.models.neural_decoder import NeuralDecoderConfig
    from neural_ldpc_tpu.structs import LossType
    from neural_ldpc_tpu.training.greedy import GreedyLayerTrainer, GreedyTrainConfig

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = NeuralMinSumDecoder(g, NeuralDecoderConfig(n_iterations=3))
    chan = AWGNChannel(code, ChannelConfig(snr_db=(4.0, 3.0, 2.0)))
    trainer = GreedyLayerTrainer(dec, chan, GreedyTrainConfig(
        total_epochs=6, batch_size=16, loss_type=LossType.FEROnAllZero,
        verbose=False, learning_rate=2e-2))
    p0 = dec.init_params()
    params, _, report = trainer.train(params=p0)
    losses = report["layer_losses"]
    assert all(np.isfinite(losses))
    # FER surrogate is bounded in [0, 1]
    assert all(0.0 <= l <= 1.0 for l in losses)
    # weights actually moved
    assert any(
        np.abs(np.asarray(params[k]) - np.asarray(p0[k])).max() > 1e-4 for k in params
    )
