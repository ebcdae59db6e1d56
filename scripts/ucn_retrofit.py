"""UCN retrofit (boosting without iteration extension).

Train per-CN UCN weights for the LAST ``retro_iters`` iterations of an
already-trained base decoder, freezing everything else.  Easy words converge
before those iterations and carry no unsatisfied checks, so they are
invariant by construction; corrections act only where checks fail — the Kwak
error-floor idea without the extra-iteration overshoot that iteration
extension suffers (see benchmarks/boosted_pipeline_r1.json analysis).

Inputs: trained/bg2_qms20_base100ep.npz + trained/bg2_errorfloor_pool.npz
(produced by scripts/run_boosted_pipeline.py).  Outputs:
trained/bg2_qms20_ucn_retrofit.npz + benchmarks/ucn_retrofit_r1.json.

Run: python scripts/ucn_retrofit.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(retro_iters=5, epochs=40):
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.training import TrainConfig, Trainer
    from neural_ldpc_tpu.utils.rng import split_async

    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(2.0, 2.5, 3.0, 3.5, 4.0), qms_qbit=5))
    n_iters = 20
    start = n_iters - retro_iters

    base = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=n_iters, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
    retro = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=n_iters, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=2, vn=3),
        fixed_iterative_nodes_init_weight=start))

    bp = {k: jnp.asarray(v) for k, v in np.load("trained/bg2_qms20_base100ep.npz").items()}
    rp = dict(bp)
    # seed UCN rows from the base CN scalars -> identical behavior pre-training
    rp["weight_ucn"] = jnp.asarray(
        np.broadcast_to(np.asarray(bp["weight_cn"]), (n_iters, g.M)).copy())

    pool_path = "trained/bg2_errorfloor_pool.npz"
    if not os.path.exists(pool_path):
        raise SystemExit(
            f"{pool_path} not found (failure pools are not tracked in git; see "
            "trained/README.md). Regenerate it with:\n"
            "  python scripts/run_boosted_pipeline.py --stage harvest"
        )
    pool = np.load(pool_path)
    llr_pool, bits_pool = pool["llr"], pool["bits"]
    rng = np.random.default_rng(17)
    key_holder = [jax.random.PRNGKey(12)]

    def datagen(bs):
        n_pool = bs // 2
        idx = rng.integers(0, len(llr_pool), size=n_pool)
        key_holder[0], sub = split_async(key_holder[0])
        lf, bf = channel.sample_mixed(sub, bs - n_pool, all_zero=True)
        return (np.concatenate([llr_pool[idx], np.asarray(lf)]).astype(np.float32),
                np.concatenate([bits_pool[idx], np.asarray(bf)]).astype(np.float32))

    tcfg = TrainConfig(
        total_epochs=epochs, batch_size=512, train_words_per_epoch=20480,
        validate_words=2048, is_y_all_zero=True, validate_epoch_step=20,
        checkpoint_step=10**9, log_metrics_step=10**9, progress_step=10**9,
        checkpoint_dir="/tmp/retro_ckpt", export_weights_txt=False, verbose=True,
        patience=30, training_iter_start=start, training_iter_end=n_iters,
        train_only_params=("weight_ucn",))
    params, _, info = Trainer(retro, channel, tcfg, host_datagen=datagen).train(params=rp)
    np.savez("trained/bg2_qms20_ucn_retrofit.npz",
             **{k: np.asarray(v) for k, v in params.items()})

    out_pool = np.asarray(retro.apply(params, jnp.asarray(llr_pool))[-1])
    ok = ((out_pool < 0).astype(np.int32) == bits_pool.astype(np.int32)).all(axis=1)
    results = {"pool_corrections": int(ok.sum()), "pool_size": int(len(ok)),
               "train_info": {k: float(v) for k, v in info.items()}}
    for snr in (4.0, 4.5):
        for name, dec, pr in (("base20", base, bp), ("retrofit20", retro, params)):
            ch = AWGNChannel(code, ChannelConfig(snr_db=(snr,), qms_qbit=5))
            mc = MonteCarloCampaign(dec, pr, ch, CampaignConfig(
                batch_size=262144, max_words_per_snr=134_217_728,
                min_frame_errors=120, seed=4321, sync_every_batches=8))
            r = mc.run(verbose=False)[snr]
            results[f"{name}@{snr}"] = {"words": r["words"], "fer": r["fer"][-1],
                                        "ber": r["ber"][-1]}
            print(f"{name}@{snr}: {results[f'{name}@{snr}']}", flush=True)
    with open("benchmarks/ucn_retrofit_r1.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
