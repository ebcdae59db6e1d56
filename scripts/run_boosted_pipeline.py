"""Staged boosted error-floor pipeline runner (Kwak workflow, BASELINE
config 4) — every stage checkpoints its artifacts so a crash or timeout never
loses work.  Stages: base-train -> harvest -> post-train -> sweep.

  python scripts/run_boosted_pipeline.py --stage all --out-dir trained
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
    ap.add_argument("--stage", default="all",
                    choices=("all", "base", "harvest", "post", "sweep"))
    ap.add_argument("--out-dir", default="trained")
    ap.add_argument("--results", default="benchmarks/boosted_pipeline_r1.json")
    ap.add_argument("--base-epochs", type=int, default=100)
    ap.add_argument("--post-epochs", type=int, default=40)
    ap.add_argument("--collect-words", type=int, default=2048)
    ap.add_argument("--post-ucn-only", type=int, default=1,
                    help="1: train only UCN weights (safe standalone decoder); "
                         "0: train all post weights (aggressive second-stage "
                         "decoder for two-stage decoding)")
    ap.add_argument("--ext-npz", default=None,
                    help="override output npz for the extended decoder")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.training import TrainConfig, Trainer
    from neural_ldpc_tpu.training.boosted_pipeline import (
        BoostedPipeline, BoostedPipelineConfig,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    base_npz = os.path.join(args.out_dir, "bg2_qms20_base100ep.npz")
    pool_npz = os.path.join(args.out_dir, "bg2_errorfloor_pool.npz")
    ext_npz = args.ext_npz or os.path.join(args.out_dir, "bg2_qms25_boosted.npz")

    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0, 2.5, 3.0, 3.5, 4.0), qms_qbit=5))
    base_cfg = BoostedDecoderConfig(
        n_iterations=20, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3))

    def tcfg(epochs, ckdir, **kw):
        return TrainConfig(
            total_epochs=epochs, batch_size=512, train_words_per_epoch=20480,
            validate_words=4096, is_y_all_zero=True, validate_epoch_step=20,
            checkpoint_step=10**9, log_metrics_step=10**9, progress_step=10**9,
            checkpoint_dir=ckdir, export_weights_txt=False, verbose=True,
            patience=30, **kw)

    pipe = BoostedPipeline(
        g, channel, base_cfg,
        tcfg(args.base_epochs, "/tmp/bpipe_base"),
        tcfg(args.post_epochs, "/tmp/bpipe_post"),
        BoostedPipelineConfig(base_iters=20, post_iters=5,
                              collect_words=args.collect_words,
                              collect_batch_size=65536, collect_snr_index=-1,
                              max_collect_batches=5000, seed=911,
                              post_train_ucn_only=bool(args.post_ucn_only)),
    )

    def save(path, tree):
        np.savez(path, **{k: np.asarray(v) for k, v in tree.items()})
        print(f"[stage] wrote {path}", flush=True)

    t0 = time.time()
    stages = ("base", "harvest", "post", "sweep") if args.stage == "all" else (args.stage,)

    if "base" in stages:
        trainer = Trainer(pipe.base_decoder, channel, pipe.base_train)
        base_params, _, info = trainer.train()
        save(base_npz, base_params)
        print(f"[stage base] done at {time.time()-t0:.0f}s: {info}", flush=True)

    if "harvest" in stages:
        base_params = {k: jnp.asarray(v) for k, v in np.load(base_npz).items()}
        llr_pool, bits_pool = pipe.collect_uncorrected_words(base_params)
        np.savez(pool_npz, llr=llr_pool, bits=bits_pool)
        print(f"[stage harvest] {len(llr_pool)} words at {time.time()-t0:.0f}s", flush=True)

    if "post" in stages:
        base_params = {k: jnp.asarray(v) for k, v in np.load(base_npz).items()}
        pool = np.load(pool_npz)
        llr_pool, bits_pool = pool["llr"], pool["bits"]
        params = pipe.transfer_base_params(base_params)
        rng = np.random.default_rng(911)
        pool_datagen = pipe.make_post_datagen(llr_pool, bits_pool, rng)
        trainer2 = Trainer(pipe.post_decoder, channel, pipe.post_train,
                           host_datagen=pool_datagen)
        ext_params, _, info = trainer2.train(params=params)
        save(ext_npz, ext_params)
        print(f"[stage post] done at {time.time()-t0:.0f}s: {info}", flush=True)

    if "sweep" in stages:
        base_params = {k: jnp.asarray(v) for k, v in np.load(base_npz).items()}
        ext_params = {k: jnp.asarray(v) for k, v in np.load(ext_npz).items()}
        results = {"pipeline": {
            "base_epochs": args.base_epochs, "post_epochs": args.post_epochs,
            "collected_words": int(np.load(pool_npz)["llr"].shape[0]),
            "sharing": "cn=3, ucn=0, vn=3 (reference default)"}}
        snrs = (3.5, 4.0, 4.5)

        def sweep(name, dec, params):
            ch = AWGNChannel(code, ChannelConfig(snr_db=snrs, qms_qbit=5))
            mc = MonteCarloCampaign(dec, params, ch, CampaignConfig(
                batch_size=65536, max_words_per_snr=33_554_432,
                min_frame_errors=150, seed=4321, sync_every_batches=8))
            r = mc.run(verbose=True)
            results[name] = {str(k): {"words": v["words"], "ber": v["ber"][-1],
                                      "fer": v["fer"][-1]} for k, v in r.items()}

        # pool correction rate: fraction of the harvested base-failures the
        # post decoder fixes (the direct Kwak metric)
        pool = np.load(pool_npz)
        pl, pb = jnp.asarray(pool["llr"]), pool["bits"].astype(np.int32)
        fixed_counts = {}
        for name, dec, params in (("base20", pipe.base_decoder, base_params),
                                  ("boosted25", pipe.post_decoder, ext_params)):
            out = np.asarray(dec.apply(params, pl)[-1])
            ok = ((out < 0).astype(np.int32) == pb).all(axis=1)
            fixed_counts[name] = int(ok.sum())
        results["pool_correction"] = {
            "pool_size": int(pl.shape[0]),
            "base20_corrected": fixed_counts["base20"],
            "boosted25_corrected": fixed_counts["boosted25"],
        }
        print(f"pool correction: {fixed_counts}", flush=True)

        sweep("base20_trained", pipe.base_decoder, base_params)
        sweep("boosted25_trained", pipe.post_decoder, ext_params)
        dec_u = BoostedNeuralDecoder(g, base_cfg)
        sweep("base20_untrained", dec_u, dec_u.init_params())
        with open(args.results, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[stage sweep] wrote {args.results} at {time.time()-t0:.0f}s", flush=True)

    print("TOTAL", time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
