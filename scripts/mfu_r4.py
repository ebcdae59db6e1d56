"""Measured (not estimated) VPU utilization for the fused decode kernel
(round 4, VERDICT item 5).

Round 3's `docs/KERNEL.md` derived "33-41% of v5e VPU throughput" from a
hand-counted ~12 ops/edge-copy against a SPEC-SHEET peak.  This script
replaces both unmeasured legs:

  1. **Speed-of-light microbenchmarks on THIS chip**: two Pallas kernels —
     a pure multiply-add chain and a decode-mix chain (add/abs/min, the
     fused kernel's actual op mix) — over VMEM-resident f32 tiles with no
     memory traffic inside the timed loop.  Their measured ops/s IS the
     achievable VPU ceiling on this part (clock, ALU issue, Mosaic codegen
     included), no spec sheet involved.
  2. **Trace-derived device time**: a `jax.profiler` perfetto trace of the
     headline wman MS x5 fused decode; device-track slice durations give
     kernel-only time per word, separating the tunnel/dispatch overhead the
     wall-clock number includes.

utilization = (algorithmic ops/word x words) / device_time / measured_peak

Algorithmic ops/word uses the same accounting as KERNEL.md §"Honest MFU":
~12 VPU ops per edge-copy per iteration (2 routing adds, ~6 two-min/sign,
~4 weight/clip) = I*E*Z*12.

Also traces one early-exit campaign step at the deep-waterfall shape and
reports the channel-generation vs decode device-time split (the input to
the EE-speedup work: phase-1 decode is 3/10ths of full decode but channel
sampling is a constant cost per word).

Writes benchmarks/mfu_r4.json.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "mfu_r4.json")
TRACEDIR = os.environ.get("MFU_TRACEDIR", "/tmp/mfu_trace_r4")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig

ROWS, COLS, CHAIN, GRID, NACC = 256, 512, 64, 256, 8  # 8 live accs = 4 MB/tile


def _sol_kernel(mix):
    # Round 5 rewrite: the r4 version chained ONE serial accumulator, so the
    # "ceiling" it measured was dependency LATENCY, not issue throughput —
    # the real decode kernel beat it 1.64x.  NACC independent accumulators
    # expose ILP; step values depend on the data (no folding; the r4 fma
    # variant additionally folded to a constant — 910 "Tops/s").
    def kern(x_ref, o_ref):
        a = x_ref[...]
        accs = [a * (0.25 + 0.125 * k) for k in range(NACC)]
        for _ in range(CHAIN):
            # decode mix: add + abs + min (the CN-update op classes)
            accs = [jnp.minimum(jnp.abs(acc - a), a + acc * 0.001)
                    for acc in accs]
        total = accs[0]
        for acc in accs[1:]:
            total = total + acc
        o_ref[...] = total * 0.0625  # data-dependent output; reps keep moving

    return kern


def measure_sol(mix):
    ops_per_step = 3 if mix == "fma" else 5  # sub+abs+mul+add+min
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.5, 1.5, size=(GRID * ROWS, COLS))
        .astype(np.float32))
    fn = pl.pallas_call(
        _sol_kernel(mix),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    fn = jax.jit(fn)
    x = fn(x)
    jax.block_until_ready(x)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x)  # chained: each launch consumes the previous output
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    total_ops = GRID * ROWS * COLS * CHAIN * NACC * ops_per_step
    return {"mix": mix, "ops_per_launch": total_ops, "launch_s": dt,
            "n_acc": NACC, "finite": bool(jnp.isfinite(x).all()),
            "tops_per_s": round(total_ops / dt / 1e12, 3)}


def parse_perfetto(tracedir):
    """Sum device-track slice durations by name from the perfetto trace."""
    paths = glob.glob(os.path.join(tracedir, "**", "*.json.gz"), recursive=True)
    if not paths:
        return None, {}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # process-name metadata -> which pids are device (TPU) tracks
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Chip" in n}
    by_name = {}
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            by_name[ev["name"]] = by_name.get(ev["name"], 0.0) + ev["dur"]
    return pid_names, {k: v / 1e6 for k, v in  # us -> s
                       sorted(by_name.items(), key=lambda kv: -kv[1])[:25]}


def trace_decode(results):
    """Headline decode (wman MS x5, the bench.py configuration)."""
    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=5, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    params = dec.init_params()
    fused = FusedMinsumDecoder.from_decoder(dec, params)
    B = 262144
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, g.N, g.Z)).astype(np.float32) * 3)
    fn = jax.jit(lambda xx: fused(xx))
    jax.block_until_ready(fn(x))
    REPS = 8
    tdir = os.path.join(TRACEDIR, "decode")
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        o = fn(x)
    jax.block_until_ready(o)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    pid_names, by_name = parse_perfetto(tdir)
    ops_per_word = dec.config.n_iterations * g.E * g.Z * 12
    ent = {
        "batch": B, "reps": REPS, "wall_s": round(wall, 4),
        "wall_words_per_s": round(B * REPS / wall),
        "ops_per_word": ops_per_word,
        "device_track_names": pid_names,
        "top_device_slices_s": by_name,
    }
    # the fused kernel's custom-call slices (_fwd_run*), NOT the enclosing
    # jit program slice (which double-counts everything inside it)
    if by_name:
        ktime = sum(v for k, v in by_name.items() if "_fwd_run" in k)
        if not ktime:
            # fall back to the largest non-program slice; guard against a
            # trace with only jit_ program slices (degrade to wall-clock)
            kname, ktime = max(((k, v) for k, v in by_name.items()
                                if not k.startswith("jit_")),
                               key=lambda kv: kv[1], default=(None, 0.0))
            if kname is not None:
                ent["kernel_slice"] = kname
        if ktime:
            ent["kernel_device_s"] = round(ktime, 4)
            ach = ops_per_word * B * REPS / ktime
            ent["achieved_tops_per_s"] = round(ach / 1e12, 3)
            ent["kernel_words_per_s"] = round(B * REPS / ktime)
    results["decode_trace"] = ent
    print("decode_trace", json.dumps(ent, indent=1), flush=True)
    return results


def trace_ee_step(results):
    """One EE campaign step at the deep-waterfall shape: channel vs decode
    device-time split."""
    from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign

    code = get_code("wman_n576_r34_z24")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
        convention=Convention.STANDARD))
    raw = np.load(os.path.join(REPO, "trained", "wman_ms10_base75ep.npz"))
    params = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith("weight")}
    chan = AWGNChannel(code, ChannelConfig(snr_db=(5.5,)))
    camp = MonteCarloCampaign(dec, params, chan, CampaignConfig(
        batch_size=262144, min_frame_errors=0, max_words_per_snr=10**15,
        engine="fused", sync_every_batches=16, seed=1, early_exit_iters=3))
    camp.run_snr_point(0, batches=4)  # compile/warm
    tdir = os.path.join(TRACEDIR, "ee_step")
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    camp.run_snr_point(0, batches=32)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    _, by_name = parse_perfetto(tdir)
    ent = {"batches": 32, "batch": 262144, "wall_s": round(wall, 3),
           "wall_words_per_s": round(32 * 262144 / wall),
           "top_device_slices_s": by_name}
    results["ee_step_trace"] = ent
    print("ee_step_trace", json.dumps(ent, indent=1), flush=True)
    return results


def main():
    print("device:", jax.devices()[0], flush=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    # fma-style constant-coefficient chains either constant-fold or (data-
    # dependent variants) hang the remote Mosaic compile — the decode-mix
    # chain is the relevant ceiling and compiles reliably
    results.pop("sol_fma", None)
    for mix in ("decode_mix",):
        results[f"sol_{mix}"] = measure_sol(mix)
        print(f"sol_{mix}", json.dumps(results[f"sol_{mix}"]), flush=True)
    results = trace_decode(results)
    results = trace_ee_step(results)
    sol = results["sol_decode_mix"]["tops_per_s"]
    if "achieved_tops_per_s" in results.get("decode_trace", {}):
        results["vpu_utilization_vs_measured_sol"] = round(
            results["decode_trace"]["achieved_tops_per_s"] / sol, 3)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps({k: results[k] for k in results
                              if k.startswith(("sol_", "vpu_"))}), flush=True)


if __name__ == "__main__":
    main()
