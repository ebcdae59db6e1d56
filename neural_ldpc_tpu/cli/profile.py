"""Profiling CLI: time the decode/train hot paths and optionally capture a
device trace (the reference has no profiler at all, SURVEY.md §5).

  # steady-state decode/train latency + throughput table
  python -m neural_ldpc_tpu.cli.profile --preset boosted_default

  # capture a TensorBoard/Perfetto trace of the fused decode
  python -m neural_ldpc_tpu.cli.profile --trace-dir /tmp/trace --only decode_fused
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="profile decode/train hot paths")
    p.add_argument("--preset", default="bg2_qms_train")
    p.add_argument("--config", help="ExperimentConfig JSON file")
    p.add_argument("--batch-size", type=int, default=16384, help="decode batch")
    p.add_argument("--train-batch-size", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--trace-dir", help="capture a jax.profiler trace here")
    p.add_argument("--only", choices=("decode_fused", "decode_xla", "train"),
                   help="profile a single path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_ldpc_tpu.models import BoostedNeuralDecoder
    from neural_ldpc_tpu.training import TrainConfig, make_train_step
    from neural_ldpc_tpu.utils.config import ExperimentConfig, get_preset
    from neural_ldpc_tpu.utils.profiling import benchmark, trace

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = get_preset(args.preset)

    code, graph = cfg.build_graph()
    channel = cfg.build_channel(code)
    decoder = BoostedNeuralDecoder(graph, cfg.build_decoder_config())
    params = decoder.init_params()
    rng = np.random.default_rng(0)

    print(f"device: {jax.devices()[0]}  code: {code.name}  "
          f"decoder: {cfg.decoder_type.name} x{cfg.n_iterations} iters")

    jobs = {}

    B = args.batch_size
    x = jnp.asarray(rng.normal(size=(B, code.N, code.Z)).astype(np.float32) * 4)

    decode_xla = jax.jit(lambda p_, x_: decoder.apply(p_, x_)[-1])
    jobs["decode_xla"] = (lambda: decode_xla(params, x), B)

    try:
        from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

        fused = FusedMinsumDecoder.from_decoder(
            decoder, params, interpret=jax.default_backend() == "cpu"
        )
        jobs["decode_fused"] = (lambda: fused(x), B)
    except ValueError as e:
        print(f"decode_fused: skipped ({e})")

    TB = args.train_batch_size
    tcfg = TrainConfig(batch_size=TB)
    init_opt, step = make_train_step(decoder, tcfg)
    opt_state = init_opt(params)
    llr, bits = channel.sample_mixed(jax.random.PRNGKey(0), TB, all_zero=cfg.y_all_zero)

    def train_once():
        return step(params, opt_state, llr, bits, jnp.float32(1e-3))

    jobs["train"] = (train_once, TB)

    selected = [args.only] if args.only else list(jobs)
    for name in selected:
        if name not in jobs:
            continue
        fn, items = jobs[name]
        res = benchmark(fn, reps=args.reps, items_per_call=items)
        print(f"{name:<14} {res}")
        if args.trace_dir:
            with trace(args.trace_dir):
                jax.block_until_ready(fn())
            print(f"{name:<14} trace written to {args.trace_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
