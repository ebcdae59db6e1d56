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

Wedge-proof structure (round-2 lesson: the driver's run returned rc=124 with
no output — the single-process bench spent its whole budget on host->device
transfers over the slow tunnel plus per-batch-size recompiles before printing
anything):
  * every stage runs in its OWN subprocess under a hard watchdog, so a hung
    compile/execute can never strand the parent — the parent emits the best
    number of whatever stages completed;
  * stage 1 is the plain XLA path at one batch size: compiles in ~20s and
    guarantees a first JSON-able number within ~1 minute;
  * stage 2 upgrades to the fused Pallas kernel (the actual headline);
  * all benchmark data is generated ON DEVICE (jax.random.normal) — the
    axon tunnel moves ~10 MB/s, so a host-side numpy batch ladder alone
    blows the driver budget before any timing begins.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CPU_WORDS_PER_S = 171.8

# (name, argv suffix, watchdog seconds).  Ordered cheapest-first so a later
# hang can only ever cost its own stage.  "campaign" is reported in detail,
# not as the headline value (it is a different metric: end-to-end
# sample->decode->count throughput on the BASELINE config-5 deep-waterfall
# workload, where the round-4/5 wins — one-jit stats steps, syndrome-gated
# early exit with the auto-guard — actually live).
STAGES = [
    ("xla", 240.0),
    ("fused", 600.0),
    ("campaign", 700.0),  # 4-5 Mosaic compiles when caches are cold
]


def _build_decoder():
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

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
    return code, decoder, decoder.init_params()


def _time_decode(decode, code, batches):
    """Best words/s over on-device random batches (no host transfers)."""
    import jax
    import jax.numpy as jnp

    best, best_batch = 0.0, 0
    for batch in batches:
        t0 = time.perf_counter()
        x = jax.random.normal(
            jax.random.PRNGKey(batch), (batch, code.N, code.Z), jnp.float32
        ) * 4.0
        out = decode(x)
        jax.block_until_ready(out)  # compile + warmup
        print(
            f"  batch {batch}: compile+warmup {time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )
        reps = min(max(1, int(4_000_000 / batch)), 50)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = decode(x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        wps = batch * reps / dt
        print(
            f"  batch {batch}: {wps:,.0f} words/s ({reps} reps, {dt:.3f}s)",
            file=sys.stderr, flush=True,
        )
        if wps > best:
            best, best_batch = wps, batch
    return best, best_batch


def run_stage(stage: str):
    """Run one engine's measurement and print its JSON line to stdout."""
    import jax

    code, decoder, params = _build_decoder()
    if stage == "xla":
        decode = jax.jit(lambda x: decoder.apply(params, x)[-1])
        # one batch size: this stage exists to land a number fast (the
        # slot-matmul XLA compile alone costs ~2 min at large batch)
        best, best_batch = _time_decode(decode, code, (16384,))
    elif stage == "fused":
        from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

        fused = FusedMinsumDecoder.from_decoder(decoder, params)
        # r5: the perfetto trace put kernel-only time at 17.85M words/s vs
        # 14.4M benched — ~1.8 ms of per-dispatch tunnel overhead, which
        # keeps amortizing through MUCH larger batches (each size is ~8s of
        # compile)
        best, best_batch = _time_decode(
            fused, code, (65536, 262144, 1048576))
    elif stage == "campaign":
        best, best_batch = _run_campaign_stage()
    else:
        raise SystemExit(f"unknown stage {stage!r}")
    print(json.dumps({"stage": stage, "value": best, "batch": best_batch}), flush=True)


def _run_campaign_stage():
    """End-to-end Monte-Carlo campaign words/s: one-jit sample->decode->count
    steps (stats-only kernel) + syndrome-gated early exit behind the per-point
    auto-guard, wman MS x10 at 5.5 dB (the deep-waterfall workload of the r3
    38.8B-word floor campaign)."""
    import numpy as np
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
    from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
    from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    decoder = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "trained", "wman_ms10_base75ep.npz")
    if os.path.exists(ckpt):
        params = {k: jnp.asarray(v) for k, v in np.load(ckpt).items()
                  if k.startswith("weight")}
    else:
        params = decoder.init_params()
    B = 1048576  # measured r5: wall gaps amortize through 1M-word batches
    camp = MonteCarloCampaign(decoder, params, AWGNChannel(
        code, ChannelConfig(snr_db=(5.5,))), CampaignConfig(
        batch_size=B, min_frame_errors=0, max_words_per_snr=10**15,
        engine="fused", sync_every_batches=32, seed=1,
        # r5 trace sweep (scripts/trace_ee_now.py): I1=2 + cap B//32 beats
        # I1=3 + the default cap 19.1M vs 17.2M words/s at 5.5 dB — one
        # less phase-1 iteration outweighs the 2x escalation capacity now
        # that escalations re-sample in kernel and compaction is
        # searchsorted (both scale with capacity, not batch)
        early_exit_iters=2, early_exit_capacity=B // 32,
        early_exit_probe_batches=4,
        kernel_channel_sampling="auto"))
    camp.run_snr_point(0, batches=2)  # compile + auto-guard probe, off clock
    w0 = int(camp.words[0])
    t0 = time.perf_counter()
    camp.run_snr_point(0, batches=32)
    wps = (int(camp.words[0]) - w0) / (time.perf_counter() - t0)
    print(f"  campaign: {wps:,.0f} words/s end-to-end "
          f"(ee choice {camp._ee_choice.get(0)}, "
          f"kernel sampling {camp.kernel_sampling})", file=sys.stderr, flush=True)
    return wps, B


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2])
        return

    best = None
    campaign = None
    for stage, budget in STAGES:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", stage],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=budget,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"stage {stage}: watchdog expired ({budget:.0f}s)", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        result = None
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    result = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
        if proc.returncode != 0 or result is None:
            print(f"stage {stage}: rc={proc.returncode}, no result", file=sys.stderr)
            continue
        print(
            f"stage {stage}: {result['value']:,.0f} words/s "
            f"(batch {result['batch']}, {dt:.0f}s)",
            file=sys.stderr, flush=True,
        )
        if stage == "campaign":
            campaign = result  # separate metric: end-to-end, not raw decode
        elif best is None or result["value"] > best["value"]:
            best = result

    if best is None:
        # even the XLA stage failed — report that honestly rather than hang
        print(json.dumps({
            "metric": "decoded codewords/s/chip (wman N=576 R=3/4, min-sum, 5 iterations)",
            "value": 0.0,
            "unit": "codewords/s/chip",
            "vs_baseline": 0.0,
            "detail": {"error": "all benchmark stages failed or timed out"},
        }))
        sys.exit(1)

    import jax

    print(
        json.dumps(
            {
                "metric": "decoded codewords/s/chip (wman N=576 R=3/4, min-sum, 5 iterations)",
                "value": round(best["value"], 1),
                "unit": "codewords/s/chip",
                "vs_baseline": round(best["value"] / REFERENCE_CPU_WORDS_PER_S, 2),
                "detail": {
                    "batch": best["batch"],
                    "engine": best["stage"],
                    "device": str(jax.devices()[0]),
                    "baseline": "torch reference CPU, same workload, 171.8 words/s",
                    **({"campaign_words_per_s_e2e": round(campaign["value"], 1),
                        "campaign_workload":
                            "wman MS x10 @5.5dB sample->decode->count, "
                            "one-jit stats steps + guarded early exit"}
                       if campaign else {}),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
