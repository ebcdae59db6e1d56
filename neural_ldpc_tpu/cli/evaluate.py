"""Monte-Carlo BER/FER evaluation CLI.

  python -m neural_ldpc_tpu.cli.evaluate --preset montecarlo_campaign \
      --snr 1.0:5.0:0.5 --max-words 1000000 --min-frame-errors 100 \
      [--weights checkpoints/weights_epoch_0100.npz] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_snr(spec):
    if spec is None:
        return None
    if ":" in spec:
        start, stop, step = (float(v) for v in spec.split(":"))
        return tuple(np.round(np.arange(start, stop + 1e-9, step), 6).tolist())
    return tuple(float(v) for v in spec.split(","))


def main(argv=None):
    p = argparse.ArgumentParser(description="Monte-Carlo BER/FER campaign")
    p.add_argument("--preset", default="montecarlo_campaign")
    p.add_argument("--config", help="ExperimentConfig JSON file")
    p.add_argument("--set", action="append", metavar="KEY=VALUE")
    p.add_argument("--snr", help="SNR list 'a,b,c' or range 'start:stop:step' (dB)")
    p.add_argument("--weights", help="npz of stacked decoder params (checkpoint save_weights)")
    p.add_argument("--checkpoint", help="full training checkpoint to restore params from")
    p.add_argument("--import-reference", metavar="PATH",
                   help="load weights from a torch-reference checkpoint "
                        "(.pth, bare state_dict, or *_weights_txt export dir)")
    p.add_argument("--import-reference-unsafe", action="store_true",
                   help="allow full (weights_only=False) unpickling if the safe "
                        "torch loader rejects the file — executes arbitrary code "
                        "embedded in the checkpoint; only for trusted files")
    p.add_argument("--batch-size", type=int)
    p.add_argument("--max-words", type=int)
    p.add_argument("--min-frame-errors", type=int)
    p.add_argument("--mesh-devices", type=int)
    p.add_argument("--engine", choices=("auto", "fused", "xla"), default="auto",
                   help="decode engine: fused Pallas kernel (final-iter stats) or XLA")
    p.add_argument("--state-dir", help="campaign checkpoint dir (restartable)")
    p.add_argument("--resume", action="store_true", help="resume campaign state from --state-dir")
    p.add_argument("--out", help="write results JSON here (default stdout)")
    args = p.parse_args(argv)

    from neural_ldpc_tpu.cli.train import parse_overrides
    from neural_ldpc_tpu.eval import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.models import BoostedNeuralDecoder
    from neural_ldpc_tpu.parallel import make_mesh
    from neural_ldpc_tpu.utils import CheckpointManager
    from neural_ldpc_tpu.utils.config import ExperimentConfig, get_preset
    import dataclasses

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = get_preset(args.preset)
    overrides = parse_overrides(args.set)
    if args.snr:
        overrides["snr_db"] = parse_snr(args.snr)
    if args.batch_size:
        overrides["eval_batch_size"] = args.batch_size
    if args.max_words:
        overrides["eval_max_words_per_snr"] = args.max_words
    if args.min_frame_errors is not None:
        overrides["eval_min_frame_errors"] = args.min_frame_errors
    if args.mesh_devices:
        overrides["mesh_devices"] = args.mesh_devices
    if overrides:
        raw = dataclasses.asdict(cfg)
        raw.update(overrides)
        cfg = ExperimentConfig.from_dict(raw)

    code, graph = cfg.build_graph()
    channel = cfg.build_channel(code)
    decoder = BoostedNeuralDecoder(graph, cfg.build_decoder_config())
    params = decoder.init_params()
    if args.weights:
        # weights npz stores per-iteration names (weight_CN_0, ...); restack
        data = np.load(args.weights)
        import jax.numpy as jnp

        for key in list(params):
            node = key.split("_", 1)[1]
            prefix = f"weight_{node.upper()}_"
            names = {int(n.rsplit("_", 1)[1]): n
                     for n in data.files if n.startswith(prefix)}
            if not names:
                continue
            # temporal-sharing params store rows in temporal_rows order (which
            # need not be ascending); replay that order, not sorted()
            spec = decoder.specs[node]
            row_iters = spec.temporal_rows if spec.temporal_rows else sorted(names)
            params[key] = jnp.asarray(
                np.stack([np.atleast_1d(data[names[it]]) for it in row_iters]))
    elif args.checkpoint:
        cm = CheckpointManager(cfg.checkpoint_dir)
        params, _, _, _, _ = cm.load(args.checkpoint, params)
    elif args.import_reference:
        from neural_ldpc_tpu.utils.checkpoint import import_reference_weights

        params = import_reference_weights(
            decoder, args.import_reference,
            allow_unsafe=args.import_reference_unsafe,
        )

    mesh = make_mesh(cfg.mesh_devices) if cfg.mesh_devices else None
    camp = MonteCarloCampaign(
        decoder, params, channel,
        CampaignConfig(
            batch_size=cfg.eval_batch_size,
            max_words_per_snr=cfg.eval_max_words_per_snr,
            min_frame_errors=cfg.eval_min_frame_errors,
            all_zero=cfg.y_all_zero,
            seed=cfg.seed,
            checkpoint_dir=args.state_dir,
            engine=args.engine,
        ),
        mesh=mesh,
    )
    if args.resume and args.state_dir:
        camp.restore_state(CheckpointManager(args.state_dir))
    results = camp.run()
    payload = json.dumps({
        "code": code.name,
        "decoder": cfg.decoder_type.name,
        "n_iterations": cfg.n_iterations,
        "results": {str(k): v for k, v in results.items()},
    }, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
        print(f"wrote {args.out}")
    else:
        print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
