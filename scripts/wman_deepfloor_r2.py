"""Round-2 deep-floor recipe applied to the wman code (two-code generality):
fresh-data post-iteration training + big-pool UCN fine-tune + paired
standalone eval — same stages as scripts/boosted_deepfloor_r2.py but for
IEEE 802.16 N=576 R=3/4 MS (base-10 -> extended-13).

Artifacts: trained/wman_ms13_deepfloor{,_ft}.npz, trained/wman_deepfloor_pool.npz,
benchmarks/wman_deepfloor_r2*.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE_NPZ = "trained/wman_ms10_base75ep.npz"
EXT_NPZ = "trained/wman_ms13_deepfloor.npz"
EXT_FT_NPZ = "trained/wman_ms13_deepfloor_ft.npz"
POOL_NPZ = "trained/wman_deepfloor_pool.npz"


def build():
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig, SharingMode
    from neural_ldpc_tpu.training import LearningRate, TrainConfig
    from neural_ldpc_tpu.training.boosted_pipeline import (
        BoostedPipeline, BoostedPipelineConfig,
    )

    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0, 2.5, 3.0, 3.5, 4.0)))
    base_cfg = BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=SharingMode.ITER, ucn=SharingMode.NONE,
                                        vn=SharingMode.ITER))
    post_train = TrainConfig(
        total_epochs=120, batch_size=1024,
        train_words_per_epoch=1024 * 100, validate_words=1024 * 16,
        learning_rate=LearningRate(5e-4, 0.0, 0),
        engine="fused", patience=12, validate_epoch_step=5,
        checkpoint_step=60, log_metrics_step=5, progress_step=1000,
        checkpoint_dir="checkpoints/wman_deepfloor", seed=5353,
        export_weights_txt=False, is_y_all_zero=True,
    )
    pipe = BoostedPipeline(
        graph, channel, base_cfg, post_train, post_train,
        BoostedPipelineConfig(
            base_iters=10, post_iters=3,
            post_ucn_sharing=SharingMode.NODE_ITER,
            post_train_ucn_only=False,
            collect_words=50_000, collect_batch_size=524_288,
            collect_snr_index=-1, max_collect_batches=200_000, seed=5353,
            pool_mix_ratio=0.25,
        ),
    )
    base_params = {k: jnp.asarray(v) for k, v in np.load(BASE_NPZ).items()}
    return code, graph, channel, pipe, base_params


def stage_exttrain():
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.training import Trainer

    code, graph, channel, pipe, base_params = build()
    fresh = AWGNChannel(code, ChannelConfig(snr_db=(3.5, 4.0, 4.5)))
    params0 = pipe.transfer_base_params(base_params)
    trainer = Trainer(pipe.post_decoder, fresh, pipe.post_train)
    t0 = time.time()
    params, _, rep = trainer.train(params=params0)
    np.savez(EXT_NPZ, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"stage": "exttrain", "wall_s": round(time.time() - t0, 1),
                      "report": {k: float(v) for k, v in rep.items()}}), flush=True)


def stage_harvest(snr_harvest=4.5, target=50_000):
    import jax

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig

    code, graph, channel, pipe, base_params = build()
    pipe.channel = AWGNChannel(code, ChannelConfig(snr_db=(snr_harvest,)))
    pipe.cfg.collect_words = target
    t0 = time.time()
    llr, bits = pipe.collect_uncorrected_words(
        base_params, key=jax.random.PRNGKey(5353))
    np.savez(POOL_NPZ, llr=np.asarray(llr), bits=np.asarray(bits))
    print(json.dumps({"stage": "harvest", "pool": int(len(llr)),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


def stage_finetune(pool_ratio=0.25, epochs=50):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.training import LearningRate, Trainer

    code, graph, channel, pipe, base_params = build()
    d = np.load(POOL_NPZ)
    ext_params = {k: jnp.asarray(v) for k, v in np.load(EXT_NPZ).items()}
    rng = np.random.default_rng(99)
    pipe.cfg.pool_mix_ratio = pool_ratio
    pipe.channel = AWGNChannel(code, ChannelConfig(snr_db=(4.25, 4.5)))
    datagen = pipe.make_post_datagen(d["llr"], d["bits"], rng)
    tc = dataclasses.replace(
        pipe.post_train, total_epochs=epochs, train_only_params=("weight_ucn",),
        learning_rate=LearningRate(2e-4, 0.0, 0),
        checkpoint_dir="checkpoints/wman_deepfloor_ft")
    trainer = Trainer(pipe.post_decoder, pipe.channel, tc, host_datagen=datagen)
    t0 = time.time()
    params, _, rep = trainer.train(params=ext_params)
    np.savez(EXT_FT_NPZ, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"stage": "finetune", "wall_s": round(time.time() - t0, 1)}),
          flush=True)


def stage_eval(ext_npz, tag):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.utils.rng import split_async

    code, graph, channel, pipe, base_params = build()
    snrs = (4.25, 4.5, 4.75)
    caps = {4.25: 2e8, 4.5: 5e8, 4.75: 1.2e9}
    eval_chan = AWGNChannel(code, ChannelConfig(snr_db=snrs))
    ext_params = {k: jnp.asarray(v) for k, v in np.load(ext_npz).items()}

    def fer(decoder, params):
        camp = MonteCarloCampaign(decoder, params, eval_chan, CampaignConfig(
            batch_size=262144, engine="fused", all_zero=True,
            min_frame_errors=200, max_words_per_snr=int(max(caps.values())),
            sync_every_batches=8, seed=888))
        out = {}
        for s, sig in enumerate(eval_chan.sigma):
            while camp.words[s] < caps[snrs[s]] and camp.frame_errors[s, -1] < 200:
                camp.key, sub = split_async(camp.key)
                c = camp._step(sub, jnp.float32(sig))
                camp.bit_errors[s] += np.asarray(c.bit_errors, np.float64)
                camp.frame_errors[s] += np.asarray(c.frame_errors, np.float64)
                camp.words[s] += camp.cfg.batch_size
            r = camp.results()[snrs[s]]
            out[snrs[s]] = {"words": r["words"], "fer": r["fer"][-1],
                            "frame_errors": int(camp.frame_errors[s, -1])}
            print(f"    @{snrs[s]}: {r['words']:.2e} words FER {r['fer'][-1]:.3e} "
                  f"({out[snrs[s]]['frame_errors']} errs)", flush=True)
        return out

    print("  base-10 standalone:", flush=True)
    base_r = fer(pipe.base_decoder, base_params)
    print("  extended-13 standalone:", flush=True)
    ext_r = fer(pipe.post_decoder, ext_params)
    report = {"base": base_r, "ext": ext_r,
              "ratio": {str(s): ext_r[s]["fer"] / base_r[s]["fer"] for s in base_r}}
    with open(f"benchmarks/{tag}.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"stage": "eval", "tag": tag, "ratio": report["ratio"]}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["exttrain", "harvest", "finetune", "eval", "eval_ft", "all"])
    args = ap.parse_args()
    if args.stage in ("exttrain", "all"):
        stage_exttrain()
    if args.stage in ("harvest", "all"):
        stage_harvest()
    if args.stage in ("finetune", "all"):
        stage_finetune()
    if args.stage in ("eval", "all"):
        stage_eval(EXT_NPZ, "wman_deepfloor_r2_eval")
    if args.stage == "eval_ft":
        stage_eval(EXT_FT_NPZ, "wman_deepfloor_r2_eval_ft")


if __name__ == "__main__":
    main()
