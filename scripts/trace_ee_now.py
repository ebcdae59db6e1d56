"""One-off: trace the CURRENT ee step at the early_exit_r5 headline shape
(batch 1048576, early_exit_iters=2, 5.5 dB) and print the device-time split.
Reuses scripts/mfu_r4.py's perfetto parser."""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

I1 = int(os.environ.get("EE_I1", "3"))
CAP = os.environ.get("EE_CAP")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from mfu_r4 import parse_perfetto  # noqa: E402
from neural_ldpc_tpu.codes import TannerGraph, get_code  # noqa: E402
from neural_ldpc_tpu.models.boosted_decoder import (  # noqa: E402
    BoostedDecoderConfig, BoostedNeuralDecoder)
from neural_ldpc_tpu.structs import (  # noqa: E402
    Convention, DecoderType, NodeWeightSharingConfig)
from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig  # noqa: E402
from neural_ldpc_tpu.eval.montecarlo import (  # noqa: E402
    CampaignConfig, MonteCarloCampaign)


def main():
    print("device:", jax.devices()[0], flush=True)
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    raw = np.load(os.path.join(REPO, "trained", "wman_ms10_base75ep.npz"))
    params = {k: jnp.asarray(v) for k, v in raw.items()
              if k.startswith("weight")}
    chan = AWGNChannel(code, ChannelConfig(snr_db=(5.5,)))
    camp = MonteCarloCampaign(dec, params, chan, CampaignConfig(
        batch_size=1048576, min_frame_errors=0, max_words_per_snr=10**15,
        engine="fused", sync_every_batches=16, seed=1, early_exit_iters=I1,
        early_exit_auto_guard=False, kernel_channel_sampling="on",
        early_exit_capacity=int(CAP) if CAP else None))
    print("kernel_sampling:", camp.kernel_sampling, flush=True)
    camp.run_snr_point(0, batches=2)  # compile/warm
    tdir = "/tmp/ee_trace_now"
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    camp.run_snr_point(0, batches=16)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    _, by_name = parse_perfetto(tdir)
    top = dict(sorted(by_name.items(), key=lambda kv: -kv[1])[:16])
    print(json.dumps({
        "wall_s": round(wall, 3),
        "wall_words_per_s": round(16 * 1048576 / wall),
        "top_device_slices_s": top}, indent=1), flush=True)


if __name__ == "__main__":
    main()
