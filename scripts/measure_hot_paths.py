"""Round-3 hot-path measurement (committed methodology; writes
benchmarks/measure_r3.json).  Decode = FusedMinsumDecoder at auto tile,
final-only output; train = jitted grad of the 5/20-iteration
multi_iteration_loss through the fused custom-VJP kernels, full params via
_expanded_weights (the exact production train-step shape)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder
from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training.loss import multi_iteration_loss

res = {}


def decode(tag, dec, params, batch, N, Z, reps):
    fused = FusedMinsumDecoder.from_decoder(dec, params)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, N, Z), jnp.float32) * 4
    jax.block_until_ready(fused(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fused(x)
    jax.block_until_ready(out)
    res[tag] = {"words_per_s": round(batch * reps / (time.perf_counter() - t0)),
                "bt": fused.bt}
    print(tag, json.dumps(res[tag]), flush=True)


def train(tag, dec, params, batch, N, Z, n_iter, reps):
    ft = FusedTrainDecoder.from_decoder(dec)
    llr = jax.random.normal(jax.random.PRNGKey(2), (batch, N, Z), jnp.float32) * 4 + 6
    bits = jnp.zeros((batch, N * Z), jnp.float32)

    def loss(p):
        cw, uw, vw = dec._expanded_weights(p)
        return multi_iteration_loss(ft.apply(cw, uw, vw, llr), bits,
                                    coeff=list(range(n_iter)))

    gf = jax.jit(jax.grad(loss))
    jax.block_until_ready(gf(params))
    t0 = time.perf_counter()
    for _ in range(reps):
        gg = gf(params)
    jax.block_until_ready(gg)
    res[tag] = {"words_per_s": round(batch * reps / (time.perf_counter() - t0)),
                "bt": ft.bt}
    print(tag, json.dumps(res[tag]), flush=True)


code = get_code("wman_n576_r34_z24")
g = TannerGraph.from_basegraph(code.basegraph, code.Z)
wman_ms = BoostedNeuralDecoder(g, BoostedDecoderConfig(
    n_iterations=5, decoder_type=DecoderType.MS,
    sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
    convention=Convention.STANDARD))
decode("wman_ms5_decode", wman_ms, wman_ms.init_params(), 262144, code.N, code.Z, 15)
train("wman_ms5_train", wman_ms, wman_ms.init_params(), 8192, code.N, code.Z, 5, 10)

code2 = get_code("nr_bg2_set0_z16")
g2 = TannerGraph.from_basegraph(code2.basegraph, code2.Z)
bg2_qms = BoostedNeuralDecoder(g2, BoostedDecoderConfig(
    n_iterations=20, decoder_type=DecoderType.QMS,
    sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=3)))
decode("bg2_qms20_decode_int8", bg2_qms, bg2_qms.init_params(), 65536, code2.N, code2.Z, 10)
train("bg2_qms20_train", bg2_qms, bg2_qms.init_params(), 2048, code2.N, code2.Z, 20, 10)

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "measure_r5.json")
with open(out, "w") as f:
    json.dump(res, f, indent=1)
print("saved", out, flush=True)
