"""Round-2 deep-floor boosted pipeline: make the STANDALONE extended decoder
beat its own base (VERDICT item 2; reference machinery:
src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:264-334).

Round-1 finding: appending 5 UNTRAINED (neutral-weight) iterations to the
trained base-20 degrades FER ~4x — the extra plain-MS iterations walk away
from the trained local optimum.  Round-2 recipe:

  stage A  "exttrain": extend to 25 iterations, freeze the base rows, train
           ALL post rows (CN + VN + UCN, NODE_ITER UCN sharing) on FRESH
           mixed-SNR words near the operating point (3.0-4.5 dB) with the
           loss on post iterations only.  This repairs the overshoot: the
           post iterations become a trained continuation instead of a
           perturbation.  Fused training engine.
  stage B  "eval": paired standalone FER, base-20 vs extended-25, same
           channel words (same seed), >=100M words at 4.5/5.0 dB.
  stage C  "harvest": big error-floor pool (tens of thousands of base
           failures) with the fused decoder, checkpointed.
  stage D  "finetune": UCN-rows-only fine-tune on a low pool-mix ratio.
  stage E  "eval2": paired FER again with the fine-tuned weights.

Artifacts land in trained/ and benchmarks/deepfloor_r2*.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE_NPZ = "trained/bg2_qms20_base100ep.npz"
EXT_NPZ = "trained/bg2_qms25_deepfloor.npz"
EXT_FT_NPZ = "trained/bg2_qms25_deepfloor_ft.npz"
POOL_NPZ = "trained/bg2_deepfloor_pool.npz"


def build(snrs=(2.0, 2.5, 3.0, 3.5, 4.0)):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig, SharingMode
    from neural_ldpc_tpu.training import LearningRate, TrainConfig
    from neural_ldpc_tpu.training.boosted_pipeline import (
        BoostedPipeline, BoostedPipelineConfig,
    )

    code = get_code("nr_bg2_set0_z16")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    channel = AWGNChannel(code, ChannelConfig(snr_db=tuple(snrs), qms_qbit=5))
    base_cfg = BoostedDecoderConfig(
        n_iterations=20, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=SharingMode.ITER, ucn=SharingMode.NONE,
                                        vn=SharingMode.ITER))
    post_train = TrainConfig(
        total_epochs=150, batch_size=1024,
        train_words_per_epoch=1024 * 100, validate_words=1024 * 16,
        learning_rate=LearningRate(5e-4, 0.0, 0),
        engine="fused", patience=12, validate_epoch_step=5,
        checkpoint_step=50, log_metrics_step=5, progress_step=1000,
        checkpoint_dir="checkpoints/deepfloor_r2", seed=4242,
        export_weights_txt=False, is_y_all_zero=True,
    )
    pipe = BoostedPipeline(
        graph, channel, base_cfg, post_train, post_train,
        BoostedPipelineConfig(
            base_iters=20, post_iters=5,
            post_ucn_sharing=SharingMode.NODE_ITER,
            post_train_ucn_only=False,  # stage A trains all post rows on fresh data
            collect_words=50_000, collect_batch_size=262_144,
            collect_snr_index=-1, max_collect_batches=200_000, seed=4242,
            pool_mix_ratio=0.25,
        ),
    )
    base_params = {k: jnp.asarray(v) for k, v in np.load(BASE_NPZ).items()}
    return code, graph, channel, pipe, base_params


def stage_exttrain():
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.training import Trainer

    code, graph, channel, pipe, base_params = build()
    # fresh-data channel near the operating point for the post iterations
    fresh = AWGNChannel(code, ChannelConfig(snr_db=(3.0, 3.5, 4.0, 4.5), qms_qbit=5))
    params0 = pipe.transfer_base_params(base_params)
    trainer = Trainer(pipe.post_decoder, fresh, pipe.post_train)
    t0 = time.time()
    params, _, rep = trainer.train(params=params0)
    np.savez(EXT_NPZ, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"stage": "exttrain", "wall_s": round(time.time() - t0, 1),
                      "report": {k: float(v) for k, v in rep.items()},
                      "out": EXT_NPZ}), flush=True)


def _paired_fer(decoder, params, channel, caps, min_errs, seed=777, batch=65536):
    import jax.numpy as jnp

    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.utils.rng import split_async

    camp = MonteCarloCampaign(decoder, params, channel, CampaignConfig(
        batch_size=batch, engine="fused", all_zero=True,
        min_frame_errors=min_errs, max_words_per_snr=max(caps),
        sync_every_batches=8, seed=seed))
    out = {}
    for s, sig in enumerate(channel.sigma):
        while camp.words[s] < caps[s] and camp.frame_errors[s, -1] < min_errs:
            camp.key, sub = split_async(camp.key)
            c = camp._step(sub, jnp.float32(sig))
            camp.bit_errors[s] += np.asarray(c.bit_errors, np.float64)
            camp.frame_errors[s] += np.asarray(c.frame_errors, np.float64)
            camp.words[s] += batch
        snr = float(channel.config.snr_db[s])
        r = camp.results()[snr]
        out[snr] = {"words": r["words"], "fer": r["fer"][-1], "ber": r["ber"][-1],
                    "frame_errors": int(camp.frame_errors[s, -1])}
        print(f"    @{snr} dB: {r['words']:.3e} words FER {r['fer'][-1]:.3e} "
              f"({out[snr]['frame_errors']} errs)", flush=True)
    return out


def stage_eval(ext_npz=EXT_NPZ, tag="deepfloor_r2_eval", caps=(1.5e8, 4e8),
               snrs=(4.5, 5.0), min_errs=150):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig

    code, graph, channel, pipe, base_params = build()
    eval_chan = AWGNChannel(code, ChannelConfig(snr_db=tuple(snrs), qms_qbit=5))
    ext_params = {k: jnp.asarray(v) for k, v in np.load(ext_npz).items()}
    caps = [int(c) for c in caps]
    print("  base-20 standalone:", flush=True)
    base_r = _paired_fer(pipe.base_decoder, base_params, eval_chan, caps, min_errs)
    print("  extended-25 standalone:", flush=True)
    ext_r = _paired_fer(pipe.post_decoder, ext_params, eval_chan, caps, min_errs)
    report = {"base": base_r, "ext": ext_r,
              "ratio": {str(s): (ext_r[s]["fer"] / base_r[s]["fer"]) if base_r[s]["fer"] else None
                        for s in base_r}}
    with open(f"benchmarks/{tag}.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"stage": "eval", "tag": tag, "ratio": report["ratio"]}), flush=True)


def stage_harvest(snr_harvest=4.0, target=50_000):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig

    code, graph, channel, pipe, base_params = build()
    hchan = AWGNChannel(code, ChannelConfig(snr_db=(snr_harvest,), qms_qbit=5))
    pipe.channel = hchan
    pipe.cfg.collect_words = target
    # resumable: append to existing pool
    llrs, bits = [], []
    if os.path.exists(POOL_NPZ):
        d = np.load(POOL_NPZ)
        llrs, bits = [d["llr"]], [d["bits"]]
        pipe.cfg.collect_words = target - len(d["llr"])
        print(f"  resuming: {len(d['llr'])} words already pooled", flush=True)
        if pipe.cfg.collect_words <= 0:
            print("  pool already complete", flush=True)
            return
    import jax

    t0 = time.time()
    key = jax.random.PRNGKey(4242 + len(llrs))
    llr_new, bits_new = pipe.collect_uncorrected_words(base_params, key=key)
    llrs.append(np.asarray(llr_new)); bits.append(np.asarray(bits_new))
    llr = np.concatenate(llrs); bit = np.concatenate(bits)
    np.savez(POOL_NPZ, llr=llr, bits=bit)
    print(json.dumps({"stage": "harvest", "pool": int(len(llr)),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


def stage_finetune(pool_ratio=0.25, epochs=60):
    import dataclasses

    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.training import Trainer

    code, graph, channel, pipe, base_params = build()
    d = np.load(POOL_NPZ)
    ext_params = {k: jnp.asarray(v) for k, v in np.load(EXT_NPZ).items()}
    rng = np.random.default_rng(99)
    pipe.cfg.pool_mix_ratio = pool_ratio
    # fresh words at the harvest/operating SNRs
    pipe.channel = AWGNChannel(code, ChannelConfig(snr_db=(4.0, 4.5), qms_qbit=5))
    datagen = pipe.make_post_datagen(d["llr"], d["bits"], rng)
    from neural_ldpc_tpu.training import LearningRate

    tc = dataclasses.replace(
        pipe.post_train, total_epochs=epochs, train_only_params=("weight_ucn",),
        learning_rate=LearningRate(2e-4, 0.0, 0),
        checkpoint_dir="checkpoints/deepfloor_ft")
    trainer = Trainer(pipe.post_decoder, pipe.channel, tc, host_datagen=datagen)
    t0 = time.time()
    params, _, rep = trainer.train(params=ext_params)
    np.savez(EXT_FT_NPZ, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"stage": "finetune", "wall_s": round(time.time() - t0, 1),
                      "report": {k: float(v) for k, v in rep.items()},
                      "out": EXT_FT_NPZ}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["exttrain", "eval", "harvest", "finetune", "eval2"])
    ap.add_argument("--harvest-snr", type=float, default=4.0)
    ap.add_argument("--harvest-target", type=int, default=50_000)
    ap.add_argument("--pool-ratio", type=float, default=0.25)
    args = ap.parse_args()
    if args.stage == "exttrain":
        stage_exttrain()
    elif args.stage == "eval":
        stage_eval()
    elif args.stage == "harvest":
        stage_harvest(args.harvest_snr, args.harvest_target)
    elif args.stage == "finetune":
        stage_finetune(args.pool_ratio)
    elif args.stage == "eval2":
        stage_eval(EXT_FT_NPZ, tag="deepfloor_r2_eval_ft")


if __name__ == "__main__":
    main()
