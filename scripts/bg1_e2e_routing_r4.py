"""BG1-scale end-to-end artifact + E>512 routing-regime benchmark (round 4,
VERDICT items 4 and 6).

stage bg1      nr_bg1_like_z384 (46x68, E=316, Z=384, N*Z=26112 — the full
               BG1 lift) decoded END TO END: fused-vs-XLA agreement, decode
               throughput, and a measured BER/FER waterfall via the
               Monte-Carlo campaign engine.  This converts the synthetic
               "BG1-scale" claims into real-structure claims and exercises
               the Z=384 roll path that no prior artifact ran.
stage routing  synthetic E>512 protograph (the auto routing threshold at
               ops/pallas/fused_train.py:1788 picks "matmul" past E=512 but
               that regime had never executed): decode + train throughput
               and accuracy for BOTH routings at E~365 and E~580, recording
               the measured roll-vs-matmul crossover (or its absence).

Reference semantics being scaled: the protograph lifting of
/root/reference/src/boosted_neural_ldpc_decoder/ConnectingMatrix.py:82-99
(here index-arithmetic rolls / one-hot MXU operands instead of (EZ)^2
permutation matrices).

Writes benchmarks/bg1_routing_r4.json.  Each stage is independent and
re-runnable; the JSON is merged.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "bg1_routing_r4.json")

import numpy as np
import jax
import jax.numpy as jnp

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.ops.pallas.fused_train import FusedTrainDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig


def load_results():
    if os.path.exists(OUT):
        return json.load(open(OUT))
    return {}


def save_results(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def _throughput(fn, x, reps):
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(x)
    jax.block_until_ready(o)
    return x.shape[0] * reps / (time.perf_counter() - t0)


def stage_bg1(results):
    code = get_code("nr_bg1_like_z384")
    g = TannerGraph.from_basegraph(code.basegraph, code.Z)
    # plain (unweighted) MS x10 — a real decoder anyone can reproduce
    dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=0, ucn=0, vn=0),
        convention=Convention.STANDARD))
    params = dec.init_params()
    entry = {"code": code.name, "N": g.N, "M": g.M, "Z": g.Z, "E": g.E,
             "n_bits": g.N * g.Z, "rate": round((g.N - g.M) / g.N, 4)}

    # fused decode construct at the FULL Z=384 lift (roll routing).  The
    # APP-emitting decode's fixed VMEM stack requirement is 123.94 MB
    # (measured: 121-MB budget OOM'd by 2.94 MB) — raise the Mosaic budget
    # to 126 MB (physical 128) for this kernel only.
    t0 = time.time()
    ft = FusedTrainDecoder.from_decoder(dec, store_msgs=False,
                                        stream_outputs=False,
                                        vmem_limit_mb=126)
    rng = np.random.default_rng(7)
    B = 256
    x = jnp.asarray(rng.normal(size=(B, g.N, g.Z)).astype(np.float32) * 3)
    cw, uw, vw = dec._expanded_weights(params)
    out = np.asarray(ft.apply(cw, uw, vw, x))
    entry["fused"] = {"compile_s": round(time.time() - t0, 1),
                      "store_space": "hbm" if ft.meta.hbm_store else "vmem",
                      "bt": ft.bt, "routing": ft.meta.routing}

    # agreement vs the XLA edge-gather ground truth (small batch: the edge
    # path materializes [I, B, E*Z] streams at E*Z = 121k)
    xs = x[:32]
    ref = np.asarray(dec.apply(params, xs)[-1])
    got = np.asarray(ft.apply(cw, uw, vw, xs))
    entry["fused"]["agree"] = float(((got < 0) == (ref < 0)).mean())
    entry["fused"]["maxdiff"] = float(np.abs(got - ref).max())
    print("bg1 agreement", json.dumps(entry["fused"]), flush=True)

    # decode throughput, fused vs XLA — SAME batch for both (an undersized
    # XLA batch is dispatch-bound on the remote device and inflates the
    # ratio); the XLA edge path's [B, E*Z] per-iteration streams live in
    # HBM, so B=256 is fine at this scale
    fn = jax.jit(lambda xx: ft.apply(cw, uw, vw, xx))
    entry["fused"]["words_per_s"] = round(_throughput(fn, x, reps=10))
    entry["fused"]["batch"] = B
    fx = jax.jit(lambda xx: dec.apply(params, xx)[-1])
    entry["xla_words_per_s"] = round(_throughput(fx, x, reps=5))
    entry["xla_batch"] = B
    entry["fused"]["speedup_vs_xla"] = round(
        entry["fused"]["words_per_s"] / entry["xla_words_per_s"], 2)
    print("bg1 throughput", json.dumps(entry["fused"]), flush=True)

    # measured BER/FER waterfall (all-zero words; no generator shipped at
    # Z=384 — CodeSpec docstring).  100 frame errors or 50M words per point.
    snrs = (1.0, 1.5, 2.0, 2.5, 3.0)
    chan = AWGNChannel(code, ChannelConfig(snr_db=snrs))
    # stats-only kernel exceeds physical VMEM at Z=384 (129.23 MB of 128:
    # ~83 MB register spills + epilogue) — ride the APP + XLA-count
    # composition at the 126 MB budget the APP kernel needs
    camp = MonteCarloCampaign(dec, params, chan, CampaignConfig(
        batch_size=8192, min_frame_errors=100, max_words_per_snr=50_000_000,
        engine="fused", sync_every_batches=8, seed=31337,
        fused_stats_mode=False, fused_kwargs={"vmem_limit_mb": 126}))
    t0 = time.time()
    camp.run(verbose=True)
    res = camp.results()
    entry["waterfall"] = {
        "snrs_db": list(snrs),
        "words": [int(w) for w in camp.words],
        "ber": [res[float(s)]["ber"][-1] for s in snrs],
        "fer": [res[float(s)]["fer"][-1] for s in snrs],
        "campaign_words_per_s": round(int(camp.words.sum()) / (time.time() - t0)),
    }
    print("bg1 waterfall", json.dumps(entry["waterfall"]), flush=True)
    results["bg1_z384"] = entry
    save_results(results)


def synth_dense(seed, M=46, N=68, target_e=580, max_shift=383):
    """Denser BG1-like protograph to push E past the 512 routing threshold."""
    rng = np.random.default_rng(seed)
    bg = np.full((M, N), -1, np.int64)
    for m in range(M):
        bg[m, m] = rng.integers(0, max_shift)          # staircase
        if m > 0:
            bg[m, m - 1] = rng.integers(0, max_shift)
    free = [(m, c) for m in range(M) for c in range(M, N)]
    rng.shuffle(free)
    for m, c in free[: target_e - int((bg >= 0).sum())]:
        bg[m, c] = rng.integers(0, max_shift)
    return bg


def stage_routing(results, Zr=16, B=512, n_iter=10):
    for tag, bg in [("E365", None), ("E580", synth_dense(3))]:
        if bg is None:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from bigcode_proof import synth_bg1  # same graph as bigcode_r4
            bg = synth_bg1()
        g = TannerGraph.from_basegraph(bg, Zr)
        dec = BoostedNeuralDecoder(g, BoostedDecoderConfig(
            n_iterations=n_iter, decoder_type=DecoderType.MS,
            sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0), routing="edge"))
        p = dec.init_params()
        cw, uw, vw = dec._expanded_weights(p)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(B, g.N, Zr)).astype(np.float32) * 3)
        ref = np.asarray(dec.apply(p, x)[-1])
        ent = {"E": g.E, "Z": Zr, "auto_routing":
               "roll" if g.E <= 512 else "matmul"}
        # decode: both routings
        for mode in ("roll", "matmul"):
            t0 = time.time()
            ft = FusedTrainDecoder.from_decoder(
                dec, store_msgs=False, stream_outputs=False, routing=mode)
            out = np.asarray(ft.apply(cw, uw, vw, x))
            dent = {"compile_s": round(time.time() - t0, 1),
                    "agree": float(((out < 0) == (ref < 0)).mean()),
                    "maxdiff": float(np.abs(out - ref).max())}
            fn = jax.jit(lambda xx, ft=ft: ft.apply(cw, uw, vw, xx))
            dent["words_per_s"] = round(_throughput(fn, x, reps=20))
            ent[f"decode_{mode}"] = dent
            print(tag, f"decode_{mode}", json.dumps(dent), flush=True)
            results[f"routing_{tag}"] = ent
            save_results(results)
        # train step: both routings (grad through the custom VJP).  bt=128:
        # the matmul-mode backward at E~365/Z=16 needs 125.97 MB of VMEM at
        # the auto bt=256 (measured OOM)
        xt = x[:128]
        for mode in ("roll", "matmul"):
            ft = FusedTrainDecoder.from_decoder(dec, routing=mode, bt=128)

            def loss(c, ft=ft):
                return jnp.mean(jax.nn.sigmoid(ft.apply(c, uw, vw, xt)[-1]))

            t0 = time.time()
            gf = jax.jit(jax.grad(loss))
            gr = jax.block_until_ready(gf(cw))
            tent = {"compile_s": round(time.time() - t0, 1),
                    "grad_finite": bool(np.isfinite(np.asarray(gr)).all())}
            tent["words_per_s"] = round(_throughput(lambda _x, gf=gf: gf(cw),
                                                    xt, reps=5))
            ent[f"train_{mode}"] = tent
            print(tag, f"train_{mode}", json.dumps(tent), flush=True)
        ent["decode_crossover_matmul_wins"] = (
            ent["decode_matmul"]["words_per_s"] > ent["decode_roll"]["words_per_s"])
        ent["train_crossover_matmul_wins"] = (
            ent["train_matmul"]["words_per_s"] > ent["train_roll"]["words_per_s"])
        results[f"routing_{tag}"] = ent
        save_results(results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["bg1", "routing", "all"])
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    results = load_results()
    if args.stage in ("bg1", "all"):
        stage_bg1(results)
    if args.stage in ("routing", "all"):
        stage_routing(results)
    save_results(results)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
