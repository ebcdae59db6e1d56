"""Headline benchmark: decoded codewords/s/chip, WiMAX N=576 R=3/4, min-sum,
5 BP iterations (BASELINE config 1).

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "codewords/s/chip", "vs_baseline": N}

vs_baseline compares against the torch reference decoding the same workload
(BoostedNeuralLDPCDecoder, MS, wman, 5 iterations, batch 128, no_grad,
target_iter=4) measured on this image's CPU: 171.8 codewords/s (torch 2.13,
single CPU, best over batch sizes; re-measured 2026-08-16 — see BASELINE.md.
The reference publishes no numbers of its own, so the driver-mandated
">=10x vs CPU" anchor is this measurement).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CPU_WORDS_PER_S = 171.8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(
        graph,
        BoostedDecoderConfig(
            n_iterations=5,
            decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
            convention=Convention.STANDARD,
        ),
    )
    params = decoder.init_params()

    # fused Pallas kernel (messages VMEM-resident across iterations); falls
    # back to the XLA flat path off-TPU or if the kernel fails to build/run
    decode = None
    if jax.default_backend() != "cpu":
        try:
            fused = FusedMinsumDecoder.from_decoder(decoder, params)
            probe = jnp.zeros((256, code.N, code.Z), jnp.float32)
            jax.block_until_ready(fused(probe))
            # no outer jit: the fused decoder jits its own body; an enclosing
            # jit would inline the pallas_call and let XLA try to pin the
            # whole [NZ, B] output in scoped VMEM (montecarlo._build_step
            # keeps the same jit boundary for the same reason)
            decode = lambda p, x: fused(x)  # noqa: E731
        except Exception as e:  # pragma: no cover - resilience for the driver
            print(f"fused kernel unavailable ({type(e).__name__}); XLA path", file=sys.stderr)
    if decode is None:
        decode = jax.jit(lambda p, x: decoder.apply(p, x)[-1])

    rng = np.random.default_rng(0)
    best = 0.0
    best_batch = 0
    for batch in (16384, 65536, 262144, 524288):
        x = jnp.asarray(rng.normal(size=(batch, code.N, code.Z)).astype(np.float32) * 4)
        out = decode(params, x)
        jax.block_until_ready(out)  # compile + warmup
        reps = max(1, int(4_000_000 / batch))
        reps = min(reps, 50)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = decode(params, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        wps = batch * reps / dt
        print(f"batch {batch}: {wps:,.0f} words/s ({reps} reps, {dt:.3f}s)", file=sys.stderr)
        if wps > best:
            best, best_batch = wps, batch

    print(
        json.dumps(
            {
                "metric": "decoded codewords/s/chip (wman N=576 R=3/4, min-sum, 5 iterations)",
                "value": round(best, 1),
                "unit": "codewords/s/chip",
                "vs_baseline": round(best / REFERENCE_CPU_WORDS_PER_S, 2),
                "detail": {
                    "batch": best_batch,
                    "device": str(jax.devices()[0]),
                    "baseline": "torch reference CPU, same workload, 171.8 words/s",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
