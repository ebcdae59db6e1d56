"""Reference-budget flagship training: BG2 QMSx20 to the full 500-epoch x
500-batch schedule (train/train_BoostedNeuralLDPCDecoder.py:129-176), on the
fused Pallas training engine.

The reference trains 500 epochs x 500 batches x 20 words (5M words); this run
keeps the 500x500 schedule at batch 512 (128M words, 25.6x the reference's
data budget) with the same mixed-SNR channel, loss, LR, grad clip, weight
clamp, validation cadence and early stopping.  Output:
trained/bg2_qms20_ref500ep.npz (params pytree) + checkpoints under
checkpoints/flagship_r2/ (resumable via --resume).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--batches-per-epoch", type=int, default=500)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--out", default="trained/bg2_qms20_ref500ep.npz")
    ap.add_argument("--ckpt-dir", default="checkpoints/flagship_r2")
    args = ap.parse_args()

    import jax

    from neural_ldpc_tpu.training import LearningRate, TrainConfig, Trainer
    from neural_ldpc_tpu.utils.config import get_preset

    cfg = get_preset("bg2_qms_train")
    code, graph = cfg.build_graph()
    channel = cfg.build_channel(code)
    decoder_cfg = cfg.build_decoder_config()
    from neural_ldpc_tpu.models import BoostedNeuralDecoder

    decoder = BoostedNeuralDecoder(graph, decoder_cfg)
    tc = TrainConfig(
        total_epochs=args.epochs,
        batch_size=args.batch,
        train_words_per_epoch=args.batch * args.batches_per_epoch,
        validate_words=args.batch * 20,
        learning_rate=LearningRate(1e-3, 0.0, 0),
        engine="fused",
        patience=10,
        validate_epoch_step=5,
        checkpoint_step=25,
        log_metrics_step=5,
        progress_step=100,
        checkpoint_dir=args.ckpt_dir,
        seed=2042,
        export_weights_txt=False,
    )
    print(f"device={jax.devices()[0]} words/epoch={tc.train_words_per_epoch:,}", flush=True)
    trainer = Trainer(decoder, channel, tc)
    t0 = time.time()
    if args.resume:
        params, _, summary = trainer.resume(args.resume)
    else:
        params, _, summary = trainer.train()
    dt = time.time() - t0
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"summary": {k: float(v) for k, v in summary.items()},
                      "wall_s": round(dt, 1), "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
