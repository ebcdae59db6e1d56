"""Config dataclass round-trip and CLI plumbing (parser-level, no training)."""

import json

import pytest

from neural_ldpc_tpu.cli.evaluate import parse_snr
from neural_ldpc_tpu.cli.train import build_parser, parse_overrides, resolve_config
from neural_ldpc_tpu.structs import Convention, DecoderType, LossType, SharingMode
from neural_ldpc_tpu.utils.config import PRESETS, ExperimentConfig, get_preset


def test_presets_cover_baseline_configs():
    assert set(PRESETS) == {
        "wman_ms_plain", "wman_neural_train", "bg2_qms_train",
        "boosted_error_floor", "montecarlo_campaign",
    }
    for name, cfg in PRESETS.items():
        code = cfg.build_code()
        assert code.n_bits in (576, 832)
        cfg.build_decoder_config()
        cfg.build_train_config()


def test_config_json_roundtrip():
    cfg = get_preset("boosted_error_floor").override(
        total_epochs=7, snr_db=(1.0, 2.0), convention=Convention.REFERENCE)
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.decoder_type is DecoderType.QMS
    assert cfg2.loss_type is LossType.BCE
    assert cfg2.cn_sharing is SharingMode.ITER
    assert cfg2.snr_db == (1.0, 2.0)


def test_config_rejects_unknown_field():
    with pytest.raises(KeyError, match="unknown config field"):
        ExperimentConfig.from_dict({"not_a_field": 1})


def test_cli_overrides():
    assert parse_overrides(["batch_size=64", "snr_db=[1.0,2.0]"]) == {
        "batch_size": 64, "snr_db": [1.0, 2.0]}
    args = build_parser().parse_args(
        ["--preset", "wman_ms_plain", "--epochs", "3", "--y_all_zero",
         "--set", "batch_size=8"])
    cfg = resolve_config(args)
    assert cfg.total_epochs == 3 and cfg.y_all_zero and cfg.batch_size == 8
    assert cfg.code == "wman_n576_r34_z24"


def test_snr_range_parsing():
    assert parse_snr("1.0:2.0:0.5") == (1.0, 1.5, 2.0)
    assert parse_snr("3,4.5") == (3.0, 4.5)
    assert parse_snr(None) is None


def test_dump_config_is_valid_json(capsys):
    from neural_ldpc_tpu.cli.train import main

    assert main(["--preset", "wman_ms_plain", "--dump-config"]) == 0
    out = capsys.readouterr().out
    parsed = json.loads(out)
    assert parsed["code"] == "wman_n576_r34_z24"


def test_profiling_harness():
    """benchmark() separates compile from steady state; Timer accumulates."""
    import time

    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.utils.profiling import Timer, benchmark

    @jax.jit
    def f(x):
        return (x * 2 + 1).sum()

    res = benchmark(f, jnp.ones((64, 64)), reps=5, items_per_call=64)
    assert res.reps == 5
    assert res.best_s <= res.mean_s
    assert res.items_per_s and res.items_per_s > 0
    assert "mean" in str(res)

    t = Timer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2
    rep = t.report()
    assert "a" in rep and "share" in rep


@pytest.mark.slow
def test_profile_cli_runs():
    from neural_ldpc_tpu.cli.profile import main

    rc = main(["--preset", "wman_ms_plain", "--batch-size", "64",
               "--train-batch-size", "8", "--reps", "2", "--only", "decode_xla"])
    assert rc == 0


def test_derive_gen_matrix_config_flag():
    from neural_ldpc_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(code="wman_n576_r34_z24", derive_gen_matrix=True)
    code = cfg.build_code()
    assert code.gen_matrix is not None
    assert code.gen_matrix.shape == (code.n_info_bits, code.n_bits)
    # channel can now generate random codewords for wman
    import jax

    channel = cfg.build_channel(code)
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(0), 4, all_zero=False)
    assert float(bits.sum()) > 0


def test_metrics_logger_golden_format(tmp_path):
    """Byte-level golden file for the training_metrics.txt format (parity with
    the reference MetricsLogger's output, src/checkpoint_utils/
    MetricsLogger.py:37-56: header block on epoch 0, %.6e for *ber* keys,
    %.6f otherwise, trailing checkpoint column)."""
    from datetime import datetime

    from neural_ldpc_tpu.utils.metrics_logger import MetricsLogger

    frozen = datetime(2026, 3, 1, 12, 30, 45)
    lg = MetricsLogger(str(tmp_path), clock=lambda: frozen)
    metrics = {"loss": 0.123456789, "ber_last_iter": 3.25e-5, "fer_last_iter": 0.5}
    lg.log(0, metrics, "ckpt_0000.npz", config={"lr": 0.001, "iters": 20})
    lg.log(7, metrics, "ckpt_0007.npz")

    expected = (
        "# Training started: 2026-03-01 12:30:45\n"
        "# Config: lr=0.001, iters=20\n"
        "# Columns: Epoch, Timestamp, loss, ber_last_iter, fer_last_iter, Checkpoint_File\n"
        + "-" * 120 + "\n"
        "   0, 2026-03-01 12:30:45, 0.123457, 3.250000e-05, 0.500000, ckpt_0000.npz\n"
        "   7, 2026-03-01 12:30:45, 0.123457, 3.250000e-05, 0.500000, ckpt_0007.npz\n"
    )
    assert (tmp_path / "training_metrics.txt").read_text() == expected

    assert lg.is_best(1e-3) and not lg.is_best(1e-3) and lg.is_best(1e-4)


def test_train_progress_golden_format():
    """Golden string for the progress line (reference train/…:21-69 fields)."""
    from datetime import datetime

    from neural_ldpc_tpu.training.train_loop import format_eta, format_train_progress

    now = datetime(2026, 3, 1, 9, 0, 0)
    line = format_train_progress(
        50, 100, 2, 4, loss=0.054321, start_time=now.timestamp() - 150.0,
        bar_length=8, now=now,
    )
    # epoch 2/4 -> half-filled bar; 150 done of 400 total in 150s -> ETA 250s
    assert line == "[09:00:00] Epoch 2/4 [####    ] 50/100 Loss: 0.054321 ETA: 4m 10s"
    assert format_train_progress(0, 10, 1, 2, now=now) == \
        "[09:00:00] Epoch 1/2 [" + "#" * 20 + " " * 20 + "] 0/10"
    assert format_eta(7500) == "2h 5m" and format_eta(47) == "47s" and format_eta(312) == "5m 12s"


def test_evaluate_cli_import_reference(tmp_path):
    """--import-reference evaluates weights exported by the torch reference's
    CheckPointUtil txt format end-to-end through the CLI."""
    import numpy as np

    from neural_ldpc_tpu.cli.evaluate import main as eval_main

    # synthesize a txt export for the default preset's decoder (QMS 20 iters,
    # cn=3/vn=3 scalars per iteration)
    txt_dir = tmp_path / "weights_txt"
    txt_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = ["# header", "-" * 80, "Parameter_Name, Shape, Filename"]
    for nt in ("CN", "VN"):
        for i in range(20):
            name = f"weight_{nt}_{i}"
            np.savetxt(txt_dir / f"{name}.txt", np.atleast_1d(
                rng.uniform(0.5, 1.5, size=(1,)).astype(np.float32)))
            lines.append(f"{name}, [1], {name}.txt")
    (txt_dir / "index.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "res.json"
    rc = eval_main([
        "--import-reference", str(txt_dir),
        "--snr", "3.0", "--batch-size", "64", "--max-words", "128",
        "--min-frame-errors", "0", "--engine", "xla", "--out", str(out),
    ])
    assert rc == 0 and out.exists()
    import json
    data = json.loads(out.read_text())
    assert data["results"]["3.0"]["words"] == 128
