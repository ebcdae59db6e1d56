"""Round-3 deep-waterfall extension: the trained wman MS x10 decoder
(trained/wman_ms10_base75ep.npz, the round-2 artifact measured floor-free to
FER 4.5e-8 @5.5 dB on 393M words) pushed two SNR points deeper — 5.75 and
6.0 dB, the 1e-8..1e-9 FER regime.  Feasible on one chip because the round-3
kernels decode ~7M words/s at MS x10: ~1e10 words/point in under an hour.

Restartable: counters+PRNG checkpoint under trained/, partial results land in
benchmarks/wman_waterfall_r3.json after every progress sync, so an
interrupted run still yields a valid (lower-confidence) measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.utils.checkpoint import CheckpointManager
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

SNRS = (5.75, 6.0)
CAPS = {5.75: 20_000_000_000, 6.0: 60_000_000_000}
TARGET_ERRORS = 150
WALL_BUDGET_S = float(os.environ.get("WALL_BUDGET_S", 3600 * 5))
OUT = os.path.join(REPO, "benchmarks", "wman_waterfall_r3.json")


def main():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD,
    ))
    raw = np.load(os.path.join(REPO, "trained", "wman_ms10_base75ep.npz"))
    params = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith("weight")}

    chan = AWGNChannel(code, ChannelConfig(snr_db=SNRS))
    camp = MonteCarloCampaign(decoder, params, chan, CampaignConfig(
        batch_size=262144, min_frame_errors=TARGET_ERRORS,
        max_words_per_snr=max(CAPS.values()), engine="fused",
        sync_every_batches=8, seed=20260817,
        checkpoint_dir=os.path.join(REPO, "trained", "wman_waterfall_r3_state"),
        checkpoint_every_batches=512,
    ))

    state_dir = os.path.join(REPO, "trained", "wman_waterfall_r3_state")
    ckpt = CheckpointManager(state_dir)
    if os.path.exists(os.path.join(state_dir, "mc_campaign.npz")):
        camp.restore_state(ckpt)
        print(f"resumed: words={camp.words.tolist()} "
              f"errors={camp.frame_errors[:, -1].tolist()}", flush=True)

    t_start = time.time()

    def flush(note):
        out = {"decoder": "wman_ms10_base75ep", "iterations": 10,
               "engine": "fused", "note": note,
               "elapsed_s": round(time.time() - t_start, 1), "points": {}}
        res = camp.results()
        for s, snr in enumerate(SNRS):
            r = res[snr]
            fe = float(camp.frame_errors[s, -1])
            out["points"][str(snr)] = {
                "words": int(camp.words[s]),
                "frame_errors": int(fe),
                "fer": r["fer"][-1],
                "ber": r["ber"][-1],
            }
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    for s, snr in enumerate(SNRS):
        print(f"=== SNR {snr} dB (cap {CAPS[snr]:.1e} words) ===", flush=True)
        t0 = time.time()
        while (camp.words[s] < CAPS[snr]
               and camp.frame_errors[s, -1] < TARGET_ERRORS
               and time.time() - t_start < WALL_BUDGET_S):
            camp.run_snr_point(s, batches=64)
            camp.save_state(ckpt)
            flush("in progress")
            wps = camp.words[s] / max(time.time() - t0, 1e-9)
            fe = camp.frame_errors[s, -1]
            fer = fe / max(camp.words[s], 1)
            print(f"  {camp.words[s]:,} words, {int(fe)} errors, "
                  f"FER {fer:.3e}, {wps:,.0f} w/s", flush=True)
        flush("complete" if camp.frame_errors[s, -1] >= TARGET_ERRORS
              else "budget reached")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
