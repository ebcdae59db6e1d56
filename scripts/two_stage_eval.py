"""Two-stage (Kwak operational mode) paired evaluation.

Decodes identical channel words with the base-20 decoder alone and with the
base + aggressive-post-25 two-stage system (syndrome-routed escalation,
eval/two_stage.py).  Produces benchmarks/two_stage_r1.json.

Requires: trained/bg2_qms20_base100ep.npz and
trained/bg2_qms25_post_aggressive.npz (scripts/run_boosted_pipeline.py
--stage post --post-ucn-only 0 --ext-npz trained/bg2_qms25_post_aggressive.npz).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.eval.two_stage import TwoStageDecoder
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.utils.rng import split_async

    code = get_code("nr_bg2_set0_z16")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    base = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=20, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
    post = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=25, decoder_type=DecoderType.QMS, qms_qbit=5,
        sharing=NodeWeightSharingConfig(cn=3, ucn=2, vn=3),
        fixed_iterative_nodes_init_weight=20))
    bp = {k: jnp.asarray(v) for k, v in np.load("trained/bg2_qms20_base100ep.npz").items()}
    pp = {k: jnp.asarray(v)
          for k, v in np.load("trained/bg2_qms25_post_aggressive.npz").items()}
    f_base = FusedMinsumDecoder.from_decoder(base, bp)
    f_post = FusedMinsumDecoder.from_decoder(post, pp)
    ts = TwoStageDecoder(g, f_base, f_post)

    count = jax.jit(lambda a1, a2, ok1: (
        jnp.sum(jnp.any(a1 < 0, axis=1)),
        jnp.sum(jnp.any(jnp.where(ok1[:, None], a1, a2) < 0, axis=1)),
        jnp.sum(~ok1),
    ))

    results = {}
    for snr, n_batches in ((4.0, 512), (4.5, 1024)):
        ch = AWGNChannel(code, ChannelConfig(snr_db=(snr,), qms_qbit=5))
        B = 262144
        key = jax.random.PRNGKey(808)
        tot = np.zeros(3, np.int64); words = 0; pend = []
        for _ in range(n_batches):
            key, sub = split_async(key)
            llr, _ = ch.sample_at(sub, B, 0)
            a1 = f_base(llr)
            pend.append(count(a1, f_post(llr), ts._syndrome_ok(a1)))
            words += B
            if len(pend) >= 8:
                for c in pend:
                    tot += np.asarray([int(v) for v in c])
                pend = []
        for c in pend:
            tot += np.asarray([int(v) for v in c])
        results[str(snr)] = {
            "words": words, "base_frame_errors": int(tot[0]),
            "system_frame_errors": int(tot[1]), "escalated": int(tot[2]),
            "base_fer": tot[0] / words, "system_fer": tot[1] / words,
            "improvement": tot[0] / max(tot[1], 1)}
        print(snr, results[str(snr)], flush=True)
    with open("benchmarks/two_stage_r1.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
