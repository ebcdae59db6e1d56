"""Round-5 early-exit artifact: in-kernel channel sampling + auto-guard.

Extends benchmarks/early_exit_r4.json (threefry sampling, no guard, 1.57x
ceiling at 5.5 dB, 0.64x SLOWDOWN at 4.0 dB) with the round-5 engine:

  * counter EQUALITY on hardware between the syndrome-gated EE step and the
    full unroll on IDENTICAL in-kernel-sampled words, per SNR point;
  * end-to-end throughput of full vs EE, threefry vs kernel-sampled, at the
    measured best config (batch 1M, 32-batch sync windows);
  * the auto-guard's per-point decisions (it must pick the full unroll in
    the high-escalation regime where EE loses).

Writes benchmarks/early_exit_r5.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "early_exit_r5.json")

import numpy as np
import jax
import jax.numpy as jnp

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

B = 1048576
SNRS = (4.0, 5.0, 5.5)


def build():
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    params = {k: jnp.asarray(v) for k, v in np.load(
        os.path.join(REPO, "trained", "wman_ms10_base75ep.npz")).items()
        if k.startswith("weight")}
    chan = AWGNChannel(code, ChannelConfig(snr_db=SNRS))
    return dec, params, chan


def run_point(dec, params, chan, s, batches, **kw):
    camp = MonteCarloCampaign(dec, params, chan, CampaignConfig(
        batch_size=B, min_frame_errors=0, max_words_per_snr=10**15,
        engine="fused", sync_every_batches=32, seed=1, **kw))
    camp.run_snr_point(s, batches=2)  # compile/warm/probe
    w0, be0, fe0 = (int(camp.words[s]), float(camp.bit_errors[s, -1]),
                    float(camp.frame_errors[s, -1]))
    t0 = time.perf_counter()
    camp.run_snr_point(s, batches=batches)
    dt = time.perf_counter() - t0
    return {
        "words": int(camp.words[s]) - w0,
        "bit_errors": float(camp.bit_errors[s, -1]) - be0,
        "frame_errors": float(camp.frame_errors[s, -1]) - fe0,
        "words_per_s": round((int(camp.words[s]) - w0) / dt),
        "ee_choice": camp._ee_choice.get(s),
        "kernel_sampling": camp.kernel_sampling,
    }


def main():
    print("device:", jax.devices()[0], flush=True)
    dec, params, chan = build()
    results = {"batch_size": B, "points": {}}
    for s, snr in enumerate(SNRS):
        ent = {}
        nb = 16 if snr == 4.0 else 32
        ent["full_threefry"] = run_point(dec, params, chan, s, nb)
        ent["full_sampled"] = run_point(dec, params, chan, s, nb,
                                        kernel_channel_sampling="on")
        ent["ee_sampled"] = run_point(
            dec, params, chan, s, nb, kernel_channel_sampling="on",
            early_exit_iters=3, early_exit_auto_guard=False)
        # identical sampled words => counters must be EXACTLY equal
        ent["counters_equal"] = (
            ent["ee_sampled"]["bit_errors"] == ent["full_sampled"]["bit_errors"]
            and ent["ee_sampled"]["frame_errors"]
            == ent["full_sampled"]["frame_errors"])
        ent["ee_speedup_vs_full_sampled"] = round(
            ent["ee_sampled"]["words_per_s"]
            / ent["full_sampled"]["words_per_s"], 2)
        ent["ee_speedup_vs_full_threefry"] = round(
            ent["ee_sampled"]["words_per_s"]
            / ent["full_threefry"]["words_per_s"], 2)
        # guarded run: the auto-guard must not lose to the full unroll
        ent["guarded"] = run_point(
            dec, params, chan, s, nb, kernel_channel_sampling="on",
            early_exit_iters=3, early_exit_probe_batches=2)
        results["points"][str(snr)] = ent
        print(snr, json.dumps(ent), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
