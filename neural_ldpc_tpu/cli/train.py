"""Training CLI.

Covers the reference entry point (train/train_BoostedNeuralLDPCDecoder.py
argparse: --epochs, --y_all_zero, :461-469) and extends it with preset/config
selection, field overrides, all three training modes, and mesh control.

Usage:
  python -m neural_ldpc_tpu.cli.train --preset bg2_qms_train --epochs 50
  python -m neural_ldpc_tpu.cli.train --config run.json --set batch_size=64
  python -m neural_ldpc_tpu.cli.train --preset boosted_error_floor
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        k, v = pair.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def build_parser():
    p = argparse.ArgumentParser(description="Train a TPU-native neural LDPC decoder")
    p.add_argument("--preset", default="bg2_qms_train",
                   help="named experiment preset (see utils/config.py PRESETS)")
    p.add_argument("--config", help="path to an ExperimentConfig JSON file")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="override any config field (JSON-parsed value)")
    # reference-compatible shortcuts (train/…:461-469)
    p.add_argument("--epochs", type=int, help="total training epochs")
    p.add_argument("--y_all_zero", action="store_true",
                   help="use all-zero codewords for training")
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="shard the batch over N devices (default: single device)")
    p.add_argument("--resume", metavar="CKPT", default=None,
                   help="resume standard-mode training from a checkpoint name "
                        "in the configured checkpoint_dir (restores params, "
                        "optimizer state, epoch and RNG)")
    p.add_argument("--dump-config", action="store_true",
                   help="print the resolved config JSON and exit")
    return p


def resolve_config(args):
    from neural_ldpc_tpu.utils.config import ExperimentConfig, get_preset

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = get_preset(args.preset)
    overrides = parse_overrides(args.set)
    if args.epochs is not None:
        overrides["total_epochs"] = args.epochs
    if args.y_all_zero:
        overrides["y_all_zero"] = True
    if args.mesh_devices is not None:
        overrides["mesh_devices"] = args.mesh_devices
    if overrides:
        from neural_ldpc_tpu.utils.config import ExperimentConfig as EC
        import dataclasses

        raw = dataclasses.asdict(cfg)
        raw.update(overrides)
        cfg = EC.from_dict({k: v for k, v in raw.items()})
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = resolve_config(args)
    if args.dump_config:
        print(cfg.to_json())
        return 0

    from neural_ldpc_tpu.models import BoostedNeuralDecoder, NeuralMinSumDecoder
    from neural_ldpc_tpu.models.neural_decoder import NeuralDecoderConfig
    from neural_ldpc_tpu.parallel import make_mesh
    from neural_ldpc_tpu.training import Trainer
    from neural_ldpc_tpu.training.boosted_pipeline import BoostedPipeline, BoostedPipelineConfig
    from neural_ldpc_tpu.training.greedy import GreedyLayerTrainer, GreedyTrainConfig
    from neural_ldpc_tpu.utils import CheckpointManager

    code, graph = cfg.build_graph()
    channel = cfg.build_channel(code)
    mesh = make_mesh(cfg.mesh_devices) if cfg.mesh_devices else None
    print(f"code={code.name} N={code.n_bits} K={code.n_info_bits} "
          f"mode={cfg.mode} decoder={cfg.decoder_type.name} iters={cfg.n_iterations}")

    if cfg.mode == "greedy":
        decoder = NeuralMinSumDecoder(graph, NeuralDecoderConfig(
            n_iterations=cfg.n_iterations, convention=cfg.convention))
        trainer = GreedyLayerTrainer(decoder, channel, GreedyTrainConfig(
            total_epochs=cfg.total_epochs, batch_size=cfg.batch_size,
            learning_rate=cfg.learning_rate, is_y_all_zero=cfg.y_all_zero,
            seed=cfg.seed))
        params, _, report = trainer.train()
        CheckpointManager(cfg.checkpoint_dir).save_weights(
            "greedy_final", decoder.named_parameter_rows(params), as_txt=True)
        print("greedy training done:", report["layer_losses"][-1])
    elif cfg.mode == "boosted":
        pipe = BoostedPipeline(
            graph, channel,
            cfg.build_decoder_config(n_iterations=cfg.base_iters),
            cfg.build_train_config(), cfg.build_train_config(),
            BoostedPipelineConfig(base_iters=cfg.base_iters,
                                  post_iters=cfg.post_iters,
                                  collect_words=cfg.collect_words),
            mesh=mesh,
        )
        base_params, ext_params, report = pipe.run()
        CheckpointManager(cfg.checkpoint_dir).save_weights(
            "boosted_final", pipe.post_decoder.named_parameter_rows(ext_params),
            as_txt=True)
        print("boosted pipeline done:", json.dumps(
            {k: v for k, v in report.items() if k == "collected_words"}))
    else:
        decoder = BoostedNeuralDecoder(graph, cfg.build_decoder_config())
        trainer = Trainer(decoder, channel, cfg.build_train_config(), mesh=mesh)
        if args.resume:
            params, _, summary = trainer.resume(args.resume)
        else:
            params, _, summary = trainer.train()
        print("training done:", json.dumps({k: float(v) for k, v in summary.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
