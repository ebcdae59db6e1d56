"""Full benchmark suite: decode tiers x codes, train step, host datagen.

Writes one JSON blob (stdout or --out) so runs are comparable across
commits.  The bench.py at the repo root stays the single-line headline; this
is the engineering view.

Run: python benchmarks/suite.py [--quick] [--out results.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller batches/reps")
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_ldpc_tpu import native
    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig, HostDatagen
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
    from neural_ldpc_tpu.training import TrainConfig, make_train_step
    from neural_ldpc_tpu.utils.profiling import benchmark

    on_tpu = jax.default_backend() != "cpu"
    B = 16384 if args.quick else 131072
    reps = 5 if args.quick else 15
    results = {"device": str(jax.devices()[0]), "batch": B,
               "timing_note": "per-call synchronous; bench.py measures pipelined throughput"}
    rng = np.random.default_rng(0)

    workloads = [
        # (key, code, decoder type, iters, sharing)
        ("wman_ms_5", "wman_n576_r34_z24", DecoderType.MS, 5, dict(cn=3, ucn=0, vn=0)),
        ("bg2_qms_20", "nr_bg2_set0_z16", DecoderType.QMS, 20, dict(cn=3, ucn=0, vn=3)),
    ]

    for key, code_name, dt, iters, sharing in workloads:
        code = get_code(code_name)
        g = TannerGraph.from_basegraph(code.basegraph, code.Z)
        # XLA tiers stack all per-iteration outputs in HBM — cap their batch;
        # the fused kernel emits only the final APP and takes the full batch
        B_xla = min(B, 16384)
        x_xla = jnp.asarray(rng.normal(size=(B_xla, code.N, code.Z)).astype(np.float32) * 4)
        x_fused = jnp.asarray(rng.normal(size=(B, code.N, code.Z)).astype(np.float32) * 4)
        entry = {"batch_xla": B_xla}
        for routing in ("flat", "edge"):
            dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
                n_iterations=iters, decoder_type=dt, qms_qbit=5,
                sharing=NodeWeightSharingConfig(**sharing), routing=routing))
            p = dec.init_params()
            f = jax.jit(lambda x_, d=dec, p_=p: d.apply(p_, x_)[-1])
            r = benchmark(f, x_xla, reps=reps, items_per_call=B_xla)
            entry[f"decode_{routing}_wps"] = round(r.items_per_s, 1)
            if routing == "flat" and on_tpu:
                fused = FusedMinsumDecoder.from_decoder(dec, p)
                r = benchmark(fused, x_fused, reps=reps, items_per_call=B)
                entry["decode_fused_wps"] = round(r.items_per_s, 1)
        # train step: XLA-autodiff engine and (on TPU) the fused custom-VJP
        # engine (ops/pallas/fused_train.py)
        dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
            n_iterations=iters, decoder_type=dt, qms_qbit=5,
            sharing=NodeWeightSharingConfig(**sharing)))
        p = dec.init_params()
        channel = AWGNChannel(code, ChannelConfig(qms_qbit=5 if dt == DecoderType.QMS else None))
        engines = ("xla", "fused") if on_tpu else ("xla",)
        for engine in engines:
            tb = 4096 if engine == "fused" else 512
            init_opt, step = make_train_step(dec, TrainConfig(batch_size=tb,
                                                              engine=engine))
            opt = init_opt(p)
            llr, bits = channel.sample_mixed(jax.random.PRNGKey(0), tb, all_zero=True)
            r = benchmark(lambda: step(p, opt, llr, bits, jnp.float32(1e-3)),
                          reps=reps, items_per_call=tb)
            entry[f"train_step_{engine}_wps"] = round(r.items_per_s, 1)
        entry["train_step_wps"] = entry[f"train_step_{engines[-1]}_wps"]
        results[key] = entry
        print(f"{key}: {json.dumps(entry)}", file=sys.stderr)

    # host datagen (native C++); warm up first — the initial call pays the
    # one-time g++ build of the native library plus thread-pool spawn
    code = get_code("nr_bg2_set0_z16")
    dg = HostDatagen(code, ChannelConfig(snr_db=(3.0,)), seed=1)
    dg.batch(0, 256, all_zero=False)
    n = 4096
    t0 = time.perf_counter()
    dg.batch(n, n, all_zero=False)
    dt_host = time.perf_counter() - t0
    results["host_datagen"] = {
        "native": native.available(),
        "coded_words_per_s": round(n / dt_host, 1),
    }

    payload = json.dumps(results, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(payload)
        print(f"wrote {args.out}", file=sys.stderr)
    print(payload)


if __name__ == "__main__":
    main()
