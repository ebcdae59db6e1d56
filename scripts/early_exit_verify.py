"""Early-exit verification + speedup artifact (round 4, VERDICT item 3).

Runs the trained wman MS x10 deep-waterfall decoder through the Monte-Carlo
campaign twice per SNR point — full unroll vs syndrome-gated early exit —
on IDENTICAL words (same seed, same counter-addressed keys), and records:

  * exact counter equality (bit errors AND frame errors), the empirical
    backing for the early-exit semantics note in CampaignConfig;
  * end-to-end words/s for both engines (the speedup that multiplies the
    deep-floor campaign reach).

Writes benchmarks/early_exit_r4.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

SNRS = (4.0, 5.0, 5.5)
BATCHES = int(os.environ.get("EE_VERIFY_BATCHES", 512))  # x262144 words
OUT = os.path.join(REPO, "benchmarks", "early_exit_r4.json")


def main():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    raw = np.load(os.path.join(REPO, "trained", "wman_ms10_base75ep.npz"))
    params = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith("weight")}
    chan = AWGNChannel(code, ChannelConfig(snr_db=SNRS))

    results = {"batches": BATCHES, "batch_size": 262144, "ee_iters": 3,
               "points": {}}
    for tag, kw in [("full", {}), ("ee", dict(early_exit_iters=3))]:
        camp = MonteCarloCampaign(decoder, params, chan, CampaignConfig(
            batch_size=262144, min_frame_errors=0, max_words_per_snr=10**15,
            engine="fused", sync_every_batches=16, seed=90909, **kw))
        for s, snr in enumerate(SNRS):
            camp.run_snr_point(s, batches=4)  # warm/compile
            w0, b0, f0 = camp.words[s], camp.bit_errors[s, -1], camp.frame_errors[s, -1]
            t0 = time.time()
            camp.run_snr_point(s, batches=BATCHES)
            dt = time.time() - t0
            p = results["points"].setdefault(str(snr), {})
            p[tag] = {
                "words": int(camp.words[s] - w0),
                "bit_errors": float(camp.bit_errors[s, -1] - b0),
                "frame_errors": float(camp.frame_errors[s, -1] - f0),
                "words_per_s": round((camp.words[s] - w0) / dt),
            }
            print(snr, tag, json.dumps(p[tag]), flush=True)

    for snr, p in results["points"].items():
        p["counters_equal"] = (
            p["full"]["bit_errors"] == p["ee"]["bit_errors"]
            and p["full"]["frame_errors"] == p["ee"]["frame_errors"]
        )
        p["speedup"] = round(p["ee"]["words_per_s"] / p["full"]["words_per_s"], 2)
    results["all_equal"] = all(p["counters_equal"] for p in results["points"].values())
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps({k: (v["speedup"], v["counters_equal"])
                              for k, v in results["points"].items()}), flush=True)


if __name__ == "__main__":
    main()
