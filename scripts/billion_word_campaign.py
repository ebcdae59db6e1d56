"""BASELINE config 5 at scale: a 1e9-codeword Monte-Carlo campaign.

Multi-host hardware is unavailable; this demonstrates the campaign engine's
throughput and checkpointable counters at the 1e9-word scale on ONE chip
(the multi-host path shards the same loop, tests/test_parallel.py).
"""
import json, time
import numpy as np, jax, jax.numpy as jnp
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

code = get_code("wman_n576_r34_z24")
g = TannerGraph.from_basegraph(code.basegraph, code.Z)
dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
    n_iterations=5, decoder_type=DecoderType.MS,
    sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
channel = AWGNChannel(code, ChannelConfig(snr_db=(5.0,)))
mc = MonteCarloCampaign(dec, dec.init_params(), channel, CampaignConfig(
    batch_size=1048576, max_words_per_snr=1_073_741_824, min_frame_errors=0,
    seed=99, sync_every_batches=16, checkpoint_dir="/tmp/billion_ckpt",
    checkpoint_every_batches=256))
t0 = time.time()
r = mc.run(verbose=True)
dt = time.time() - t0
out = {"words": int(mc.words[0]), "wall_s": round(dt, 1),
       "words_per_s": round(float(mc.words[0]) / dt, 1),
       "ber": r[5.0]["ber"][-1], "fer": r[5.0]["fer"][-1],
       "frame_errors": int(mc.frame_errors[0, -1]),
       "checkpointable": True}
print(json.dumps(out))
with open("benchmarks/billion_word_campaign.json", "w") as f:
    json.dump(out, f, indent=2)
