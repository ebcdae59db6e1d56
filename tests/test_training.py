"""Training-loop tests: jitted step correctness, loss descent, freezing,
checkpoint round-trip, txt export."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig, SharingMode
from neural_ldpc_tpu.training import LearningRate, TrainConfig, Trainer, make_train_step
from neural_ldpc_tpu.utils import CheckpointManager


@pytest.fixture(scope="module")
def setup():
    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=5, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3),
        convention=Convention.STANDARD,
    ))
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0, 3.0, 4.0),
                                              convention=Convention.STANDARD))
    return code, graph, decoder, channel


@pytest.mark.slow
def test_train_step_reduces_loss(setup):
    _, _, decoder, channel = setup
    cfg = TrainConfig(batch_size=32)
    init_opt, step = make_train_step(decoder, cfg)
    params = decoder.init_params()
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(0)
    llr, bits = channel.sample_mixed(key, 32, all_zero=True)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        llr, bits = channel.sample_mixed(sub, 32, all_zero=True)
        params, opt_state, loss = step(params, opt_state, llr, bits, jnp.float32(5e-3))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, f"loss did not decrease: {losses[0]} -> {losses[-1]}"
    # weights stayed in the clamp range
    for v in params.values():
        assert float(v.min()) >= 0.0 and float(v.max()) <= 2.0


@pytest.mark.slow
def test_frozen_rows_do_not_move(setup):
    code, graph, _, channel = setup
    decoder = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=4, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=1, ucn=0, vn=0),
        fixed_iterative_nodes_init_weight=2,  # freeze iterations 0,1
        convention=Convention.STANDARD,
    ))
    cfg = TrainConfig(batch_size=16)
    init_opt, step = make_train_step(decoder, cfg)
    params = decoder.init_params()
    opt_state = init_opt(params)
    before = np.asarray(params["weight_cn"])
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(1), 16)
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, llr, bits, jnp.float32(1e-2))
    after = np.asarray(params["weight_cn"])
    np.testing.assert_array_equal(after[:2], before[:2])  # frozen
    assert np.abs(after[2:] - before[2:]).max() > 0  # trained


@pytest.mark.slow
def test_trainer_short_run(tmp_path, setup):
    code, graph, decoder, channel = setup
    cfg = TrainConfig(
        total_epochs=2, batch_size=16, train_words_per_epoch=64,
        validate_words=32, validate_epoch_step=1, checkpoint_step=1,
        log_metrics_step=1, checkpoint_dir=str(tmp_path), verbose=False,
        learning_rate=LearningRate(1e-3, 0, 0), is_y_all_zero=True,
    )
    trainer = Trainer(decoder, channel, cfg)
    params, opt_state, summary = trainer.train()
    assert os.path.exists(tmp_path / "checkpoint_epoch_0002.npz")
    assert os.path.exists(tmp_path / "training_metrics.txt")
    txt_dir = tmp_path / "weights_epoch_0002_weights_txt"
    assert (txt_dir / "index.txt").exists()
    assert (txt_dir / "weight_CN_0.txt").exists()
    assert (txt_dir / "weight_VN_4.txt").exists()
    lines = (tmp_path / "training_metrics.txt").read_text().splitlines()
    assert lines[0].startswith("# Training started:")
    assert any(line.startswith("   2, ") for line in lines)


def test_checkpoint_roundtrip(tmp_path, setup):
    _, _, decoder, channel = setup
    cfg = TrainConfig(batch_size=8, checkpoint_dir=str(tmp_path))
    init_opt, step = make_train_step(decoder, cfg)
    params = decoder.init_params()
    opt_state = init_opt(params)
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(2), 8)
    params, opt_state, _ = step(params, opt_state, llr, bits, jnp.float32(1e-2))

    cm = CheckpointManager(str(tmp_path))
    key = jax.random.PRNGKey(7)
    cm.save("ck", params, opt_state, epoch=3, metrics={"loss": 1.0},
            rng_key=key, extra_arrays={"words": np.array(123)})
    p2, o2, meta, k2, extras = cm.load("ck", params, opt_state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 opt_state, o2)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(jax.random.key_data(k2), jax.random.key_data(key))
    assert int(extras["words"]) == 123

    # resumed training continues deterministically
    a1, _, _ = step(params, opt_state, llr, bits, jnp.float32(1e-2))
    a2, _, _ = step(p2, o2, llr, bits, jnp.float32(1e-2))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), a1, a2)


def test_train_step_clean_under_debug_nans():
    """SURVEY.md §5: nan-check smoke test — one train step with
    jax_debug_nans enabled must not trip (STE/quantize/clip paths are the
    usual suspects for hidden NaN-producing ops)."""
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.training import TrainConfig, make_train_step

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(
        g,
        BoostedDecoderConfig(
            n_iterations=3,
            decoder_type=DecoderType.QMS,
            qms_qbit=5,
            sharing=NodeWeightSharingConfig(cn=3, ucn=2, vn=3),
        ),
    )
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0,), qms_qbit=5))
    params = dec.init_params()
    init_opt, step = make_train_step(dec, TrainConfig(batch_size=8))
    opt_state = init_opt(params)
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(0), 8, all_zero=True)
    with jax.debug_nans(True):
        params, opt_state, loss = step(params, opt_state, llr, bits, jnp.float32(1e-3))
        jax.block_until_ready(params)
    assert bool(jnp.isfinite(loss))


@pytest.mark.slow
def test_resume_bitwise_matches_uninterrupted(tmp_path, setup):
    """Train 6 epochs straight vs 3 epochs + resume-from-checkpoint: final
    params, optimizer state and RNG stream must match exactly (VERDICT round-1
    gap: no end-to-end training-resume path)."""
    code, graph, decoder, channel = setup

    def cfg(total, ckpt_dir, decay=True):
        return TrainConfig(
            total_epochs=total, batch_size=16, train_words_per_epoch=64,
            validate_words=32, validate_epoch_step=3, checkpoint_step=3,
            log_metrics_step=3, checkpoint_dir=str(ckpt_dir), verbose=False,
            # exercise the stateful step-decay fast-forward on resume
            learning_rate=LearningRate(1e-2, 0.5 if decay else 0.0, 2 if decay else 0),
            is_y_all_zero=True, patience=100,
        )

    d1, d2 = tmp_path / "straight", tmp_path / "resumed"
    p_straight, opt_straight, _ = Trainer(decoder, channel, cfg(6, d1)).train()

    Trainer(decoder, channel, cfg(3, d2)).train()
    p_resumed, opt_resumed, _ = Trainer(decoder, channel, cfg(6, d2)).resume(
        "checkpoint_epoch_0003"
    )

    for k in p_straight:
        np.testing.assert_array_equal(np.asarray(p_straight[k]), np.asarray(p_resumed[k]),
                                      err_msg=f"params {k} diverged after resume")
    flat_a = jax.tree_util.tree_leaves(opt_straight)
    flat_b = jax.tree_util.tree_leaves(opt_resumed)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cli_train_resume(tmp_path, setup):
    """--resume flag end-to-end through the CLI."""
    from neural_ldpc_tpu.cli.train import main

    common = [
        "--preset", "wman_ms_plain",
        "--set", f"checkpoint_dir={tmp_path}",
        "--set", "total_epochs=2", "--set", "batch_size=8",
        "--set", "train_words_per_epoch=16", "--set", "validate_words=8",
        "--set", "validate_epoch_step=1", "--set", "checkpoint_step=1",
        "--set", "y_all_zero=true",
    ]
    assert main(common) == 0
    assert (tmp_path / "checkpoint_epoch_0002.npz").exists()
    argv = [a if a != "total_epochs=2" else "total_epochs=3" for a in common]
    assert main(argv + ["--resume", "checkpoint_epoch_0002"]) == 0
    assert (tmp_path / "checkpoint_epoch_0003.npz").exists()


@pytest.mark.slow
def test_import_reference_trained_checkpoint(tmp_path):
    """Train the torch reference for a few Adam steps, save through its own
    CheckPointUtil (full .pth checkpoint AND the per-parameter txt export),
    import both into framework params, and decode bit-exactly (QMS).
    Closes round-2 VERDICT missing item 3 (reference CheckPointUtil.py:125-159
    load path / :65-123 export)."""
    import os
    import sys

    if not os.path.isdir("/root/reference/src"):
        pytest.skip("torch reference not available")
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    torch = pytest.importorskip("torch")
    from boosted_neural_ldpc_decoder.ConnectingMatrix import ConnectingMatrix
    from boosted_neural_ldpc_decoder.ConnectingMatrixTorch import ConnectingMatrixTorch
    from boosted_neural_ldpc_decoder.BoostedNeuralLDPCDecoder import BoostedNeuralLDPCDecoder
    from boosted_neural_ldpc_decoder.struct.DecoderType import DecoderType as RefDT
    from boosted_neural_ldpc_decoder.struct.NodeWeightSharingConfig import (
        NodeWeightSharingConfig as RefNWS,
    )
    from checkpoint_utils.CheckPointUtil import CheckPointUtil

    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.utils.checkpoint import import_reference_weights

    code = get_code("wman_n576_r34_z24")
    iters, B = 4, 4
    conn = ConnectingMatrixTorch(
        ConnectingMatrix(Z=code.Z, basegraph=code.basegraph.copy()),
        device=torch.device("cpu"),
    )
    ref = BoostedNeuralLDPCDecoder(
        iter_node_counts=iters, batch_size=B, connecting_matrix=conn,
        node_weight_sharing_config=RefNWS(3, 0, 3),
        decoding_type=RefDT.QMS, decoder_qms_qbit=5,
    )
    opt = torch.optim.Adam(ref.get_trainable_parameters(), lr=5e-2)
    rng = np.random.RandomState(0)
    bce = torch.nn.BCEWithLogitsLoss()
    for _ in range(5):  # actually train: weights must move off init
        x = torch.tensor((rng.randn(B, code.N, code.Z) * 2 + 4).astype(np.float32))
        y = torch.zeros(B, code.N * code.Z)
        outs = ref(x)
        loss = sum(bce(o, y) for o in outs)
        opt.zero_grad(); loss.backward(); opt.step()
    assert any(
        float((p - 1.0).abs().max()) > 1e-3 for p in ref.get_trainable_parameters()
    )

    util = CheckPointUtil(checkpoint_dir=str(tmp_path))
    util.save("ckpt_full.pth", ref, opt, epoch=5, metrics={"loss": float(loss)})
    util.save_weights("weights_only", ref, as_txt=True)

    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    ours = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=iters, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3),
        convention=Convention.REFERENCE,
    ))

    x = (rng.randn(B, code.N, code.Z) * 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = np.stack([o.numpy() for o in ref(torch.tensor(x))])

    for src in (
        str(tmp_path / "ckpt_full.pth"),          # full training checkpoint
        str(tmp_path / "weights_only.pth"),       # bare state_dict
        str(tmp_path / "weights_only_weights_txt"),  # txt export dir
    ):
        params = import_reference_weights(ours, src)
        our_outs = np.asarray(ours.apply(params, jnp.asarray(x)))
        err = np.abs(ref_outs - our_outs).max()
        assert err == 0.0, f"{src}: trained-checkpoint decode must be bit-exact, got {err}"
