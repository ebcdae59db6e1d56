"""wman two-stage evaluation at a MID-SNR operating point (round-1 weak #5:
the deep-floor wman result was statistically neutral because the base left
only ~25 failures in 34M words; at 4.0-4.5 dB the failure population is real,
making the two-stage generality claim a two-code result).

Requires trained/wman_ms10_base75ep.npz + trained/wman_ms13_post_aggressive.npz
(round-1 artifacts, scripts/run_boosted_pipeline.py on the wman config).
Writes benchmarks/wman_two_stage_midsnr.json.
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

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    base = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
    post = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=13, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=2, vn=3),
        fixed_iterative_nodes_init_weight=10))
    bp = {k: jnp.asarray(v) for k, v in np.load("trained/wman_ms10_base75ep.npz").items()}
    pp = {k: jnp.asarray(v)
          for k, v in np.load(os.environ.get("WMAN_POST_NPZ", "trained/wman_ms13_post_aggressive.npz")).items()}
    f_base = FusedMinsumDecoder.from_decoder(base, bp)
    f_post = FusedMinsumDecoder.from_decoder(post, pp)
    ts = TwoStageDecoder(g, f_base, f_post)

    count = jax.jit(lambda a1, a2, ok1: (
        jnp.sum(jnp.any(a1 < 0, axis=1)),
        jnp.sum(jnp.any(jnp.where(ok1[:, None], a1, a2) < 0, axis=1)),
        jnp.sum(~ok1),
    ))

    results = {}
    for snr, n_batches in ((4.0, 64), (4.25, 128), (4.5, 384)):
        ch = AWGNChannel(code, ChannelConfig(snr_db=(snr,)))
        B = 262144
        key = jax.random.PRNGKey(707)
        tot = np.zeros(3, np.int64)
        words = 0
        pend = []
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
    with open(os.environ.get("WMAN_TS_OUT", "benchmarks/wman_two_stage_midsnr.json"), "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
