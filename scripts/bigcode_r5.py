"""Round-5 big-code training measurements (VERDICT r4 item 6).

Round 4 proved construction at Z<=256 but measured training throughput only
at Z=128.  This script measures fused-vs-XLA TRAINING at Z=192 and Z=256
(the HBM-streamed backward's new frontier) and records the lane-honest
Z=384 capacity verdict: the round-5 VMEM estimate (sub-128-lane tiles pad
back to 128 lanes) shows the backward's ~8 per-VN [NZp, 128] windows alone
need ~102 MB at NZp = 26112 — past physical VMEM regardless of message
checkpointing, which only reduces HBM residency.  Z=384 therefore trains on
the XLA engine (and DECODES fused — scripts/bg1_e2e_routing_r4.py); the
honest wall is recorded, not papered over.

Also measures SP (sum-product) fused training on the real wman code
(VERDICT r4 item 8: the tanh-domain backward had interpret-mode tests but
no hardware number).  Reference SP semantics:
/root/reference/src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:400-408.

Writes benchmarks/bigcode_r5.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "bigcode_r5.json")

import numpy as np
import jax
import jax.numpy as jnp

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bigcode_proof import synth_bg1  # same synthetic BG1-scale graph as r4

results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))


def _throughput(fn, arg, n, reps=5):
    jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(arg)
    jax.block_until_ready(o)
    return n * reps / (time.perf_counter() - t0)


def bench_train(tag, dec, B, decoder_type=DecoderType.MS):
    g = dec.graph
    p = dec.init_params()
    cw, uw, vw = dec._expanded_weights(p)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, g.N, g.Z)).astype(np.float32) * 3)
    ft = FusedTrainDecoder.from_decoder(dec, routing="roll")

    def loss_fused(c):
        return jnp.mean(jax.nn.sigmoid(ft.apply(c, uw, vw, x)[-1]))

    def loss_xla(pp):
        return jnp.mean(jax.nn.sigmoid(dec.apply(pp, x)[-1]))

    t0 = time.time()
    gf = jax.jit(jax.grad(loss_fused))
    gr = jax.block_until_ready(gf(cw))
    compile_s = round(time.time() - t0, 1)
    fused_wps = _throughput(gf, cw, B)
    gx = jax.jit(jax.grad(loss_xla))
    xla_wps = _throughput(gx, p, B)
    results[tag] = {
        "B": B, "Z": g.Z, "compile_s": compile_s,
        "grad_finite": bool(np.isfinite(np.asarray(gr)).all()),
        "store_space": "hbm" if ft.meta.hbm_store else "vmem", "bt": ft.bt,
        "fused_words_per_s": round(fused_wps),
        "xla_words_per_s": round(xla_wps),
        "speedup_vs_xla": round(fused_wps / xla_wps, 2),
    }
    print(tag, json.dumps(results[tag]), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    print("device:", jax.devices()[0], flush=True)
    bg = synth_bg1()

    # Z=192 / Z=256 fused training (construct-only in r4; measured here)
    for Zt, B in ((192, 128), (256, 64)):
        g = TannerGraph.from_basegraph(bg, Zt)
        dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
            n_iterations=5, decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
        bench_train(f"Z{Zt}_train", dec, B)

    # Z=384: record the lane-honest capacity verdict
    g = TannerGraph.from_basegraph(bg, 384)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=5, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    try:
        FusedTrainDecoder.from_decoder(dec, routing="roll")
        results["Z384_train_capacity"] = {"raised": False}
    except ValueError as e:
        results["Z384_train_capacity"] = {
            "raised": True, "msg": str(e)[:160],
            "analysis": "backward needs ~8 per-VN [NZp, 128] VMEM windows "
                        "(102 MB at NZp=26112) — a VMEM wall, not an HBM "
                        "one; k-stride checkpointing cannot cross it"}
    print("Z384_train_capacity", json.dumps(results["Z384_train_capacity"]),
          flush=True)

    # SP fused training on the real wman code (hardware number, r4 item 8)
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.SP,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
    bench_train("wman_SP_train", dec, 1024)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
