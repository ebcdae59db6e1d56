"""Round-5 flagship science: NEURAL training at BG1 scale, train-small /
serve-full across lifts.

The reference trains neural min-sum weights only on small codes (BG2 Z=16 /
wman Z=24; train/train_BoostedNeuralLDPCDecoder.py) — its CPU torch loop
could never reach the 26,112-bit full BG1 lift.  Here the weights are
BASEGRAPH-level quantities (one scalar per iteration under ITER sharing,
models/sharing.py), so the param pytree is identical at every lift of the
same protograph.  That enables a TPU-native workflow the reference has no
counterpart for:

  1. ``--stage train``  — train neural MS weights at Z=256 on the fused
     Pallas forward/backward tier (HBM-streamed messages; measured 3.3x the
     XLA engine at this scale, benchmarks/bigcode_r5.json), all-zero
     codewords + on-device AWGN SNR mix.  Two sharing variants: ITER
     (scalar/iteration, the reference's mode 3) and DEGREE_ITER (one weight
     per CN degree class per iteration, the framework extension —
     arXiv:2107.04221).  Degree classes are lift-invariant, so both
     transfer.
  2. ``--stage eval``   — paired FER waterfall at the FULL Z=384 lift
     (fused APP decode + XLA count at the 126 MB VMEM budget) for plain MS
     (weights = 1) vs the transferred trained weights, same seeds (paired
     noise) per decoder.
  3. ``--stage randcw`` — random-codeword verification at Z=384 via the
     quasi-cyclic generator (codes/qc_encode.py) with the generator passed
     as a traced jit argument (channel/awgn.py sample_randcw_at_sigma):
     confirms the all-zero waterfall is not a symmetry artifact.

Reference semantics being scaled: weight registration/fetch
/root/reference/src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:108-151,216-236
and the training loop /root/reference/train/train_BoostedNeuralLDPCDecoder.py.

Writes benchmarks/bg1_train_r5.json (stages merge; re-runnable) and
trained/bg1_ms10_z256_{cn3,deg6}.npz.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "bg1_train_r5.json")

import numpy as np
import jax
import jax.numpy as jnp

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph
from neural_ldpc_tpu.codes.protograph import nr_bg1_like
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import Convention, DecoderType, NodeWeightSharingConfig, SharingMode
from neural_ldpc_tpu.training.train_loop import TrainConfig, Trainer
from neural_ldpc_tpu.training.lr_schedule import LearningRate

N_ITER = 10
TRAIN_Z = 256  # default; --train-z overrides (lift-size study)
EVAL_Z = 384
_ITER = NodeWeightSharingConfig(cn=SharingMode.ITER, ucn=SharingMode.NONE,
                                vn=SharingMode.NONE)
_DEG = NodeWeightSharingConfig(cn=SharingMode.DEGREE_ITER, ucn=SharingMode.NONE,
                               vn=SharingMode.NONE)
# (sharing, training SNR mix, first loss iteration): the all-iteration BCE at
# a cliff-heavy mix maximizes waterfall gain but trades away the >=2.75 dB
# region (measured: cn3/deg6 FER ratio 0.0073-0.0078 at 2.25 dB, 1.12-1.37x
# WORSE at 2.75/3.0) — "hi" targets that region with a high-SNR-only mix.
# (A final-iteration-only loss at this mix was tried first and is a dead end:
# with LLR clip 20 the last-iteration BCE underflows to exactly 0 in f32 at
# 2.75+ dB — no gradient.  Early-iteration terms keep signal alive.)
VARIANTS = {
    "cn3": (_ITER, (2.0, 2.5, 3.0, 3.5), 0),
    "deg6": (_DEG, (2.0, 2.5, 3.0, 3.5), 0),
    "hi": (_ITER, (3.0, 3.5), 0),
}


def load_results():
    return json.load(open(OUT)) if os.path.exists(OUT) else {}


def save_results(results):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(results, open(OUT, "w"), indent=1)


def build_decoder(Z, sharing, routing="edge"):
    code = nr_bg1_like(Z)
    graph = TannerGraph.from_basegraph(code.basegraph, Z)
    dec = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=N_ITER, decoder_type=DecoderType.MS, sharing=sharing,
        convention=Convention.STANDARD, routing=routing))
    return code, dec


def ckpt_path(tag, train_z=TRAIN_Z):
    return os.path.join(REPO, "trained", f"bg1_ms{N_ITER}_z{train_z}_{tag}.npz")


def stage_train(args, results):
    for tag in args.train_tags.split(","):
        sharing, train_snrs, iter_start = VARIANTS[tag]
        if f"train_{tag}" in results and not args.force:
            print(f"[train {tag}] already recorded; --force to redo", flush=True)
            continue
        code, dec = build_decoder(TRAIN_Z, sharing)
        chan = AWGNChannel(code, ChannelConfig(snr_db=train_snrs))
        cfg = TrainConfig(
            total_epochs=args.epochs, batch_size=64,
            train_words_per_epoch=64 * args.steps_per_epoch,
            validate_words=1024, engine="fused", is_y_all_zero=True,
            training_iter_start=iter_start,
            learning_rate=LearningRate(2e-3, 0.0, 0), grad_clip_norm=1.0,
            validate_epoch_step=5, checkpoint_step=10**9,  # npz below instead
            checkpoint_dir=os.path.join(REPO, "trained", "bg1_train_r5_ckpt"),
            export_weights_txt=False, seed=2042, verbose=True,
        )
        t0 = time.time()
        trainer = Trainer(dec, chan, cfg)
        params, _opt_state, info = trainer.train()
        train_s = time.time() - t0
        np.savez(ckpt_path(tag), **{k: np.asarray(v) for k, v in params.items()})
        results[f"train_{tag}"] = {
            "Z": TRAIN_Z, "n_iterations": N_ITER, "engine": "fused",
            "sharing": tag, "train_snrs_db": list(train_snrs),
            "loss_iters": f"{iter_start}:{N_ITER}",
            "n_params": int(sum(np.size(v) for v in params.values())),
            "epochs": args.epochs, "batch": 64,
            "words_per_epoch": 64 * args.steps_per_epoch,
            "train_wall_s": round(train_s, 1),
            "final_weights": {k: np.asarray(v).ravel().round(4).tolist()
                              for k, v in params.items()},
            "best_valid_loss": float(info.get("best_loss", np.nan)),
            "ber_last_iter": float(info.get("ber_last_iter", np.nan)),
        }
        save_results(results)
        print(f"[train {tag}] done in {train_s:.0f}s -> {ckpt_path(tag)}", flush=True)


def _load_params(dec, tag):
    if tag == "base":
        return dec.init_params()
    d = np.load(ckpt_path(tag))
    return {k: jnp.asarray(d[k]) for k in d.files}


def stage_eval(args, results):
    snrs = tuple(float(s) for s in args.snrs.split(","))
    suffix = args.result_suffix
    for tag in ["base"] + list(args.eval_tags.split(",")):
        if f"eval_{tag}{suffix}" in results and not args.force:
            print(f"[eval {tag}{suffix}] already recorded; --force to redo", flush=True)
            continue
        sharing = VARIANTS.get(tag, VARIANTS["cn3"])[0]
        code, dec = build_decoder(EVAL_Z, sharing)
        params = _load_params(dec, tag)
        chan = AWGNChannel(code, ChannelConfig(snr_db=snrs))
        # stats-only kernel exceeds physical VMEM at Z=384 (129.23 MB / 128);
        # APP decode + XLA count at the measured 126 MB budget
        camp = MonteCarloCampaign(dec, params, chan, CampaignConfig(
            batch_size=8192, min_frame_errors=args.min_fe,
            max_words_per_snr=args.max_words, engine="fused",
            sync_every_batches=8, seed=31337,  # same seeds: paired noise
            fused_stats_mode=False, fused_kwargs={"vmem_limit_mb": 126}))
        t0 = time.time()
        camp.run(verbose=True)
        res = camp.results()
        results[f"eval_{tag}{suffix}"] = {
            "Z": EVAL_Z, "snrs_db": list(snrs),
            "words": [int(w) for w in camp.words],
            "frame_errors": [int(round(res[s]["fer"][-1] * w))
                             for s, w in zip(snrs, camp.words)],
            "ber": [res[s]["ber"][-1] for s in snrs],
            "fer": [res[s]["fer"][-1] for s in snrs],
            "wall_s": round(time.time() - t0, 1),
        }
        save_results(results)
        print(f"[eval {tag}{suffix}] {json.dumps(results[f'eval_{tag}{suffix}'])}", flush=True)
    # paired ratios vs base at each point
    base = results.get(f"eval_base{suffix}")
    for tag in args.eval_tags.split(","):
        ev = results.get(f"eval_{tag}{suffix}")
        if base and ev:
            results[f"gain_{tag}{suffix}"] = {
                "fer_ratio_vs_base": [
                    (ev["fer"][i] / base["fer"][i]) if base["fer"][i] > 0 else None
                    for i in range(len(base["fer"]))],
                "note": "trained-at-Z=256 weights, evaluated at the full "
                        "Z=384 lift; <1 = trained wins",
            }
    save_results(results)


def stage_randcw(args, results):
    tag = args.eval_tags.split(",")[0]
    code, dec = build_decoder(EVAL_Z, VARIANTS.get(tag, VARIANTS["cn3"])[0])
    params = _load_params(dec, tag)
    code_g = nr_bg1_like(EVAL_Z, with_gen_matrix=True)
    chan = AWGNChannel(code_g, ChannelConfig(snr_db=(args.randcw_snr,)))

    from neural_ldpc_tpu.eval.metrics import count_errors
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder

    fused = FusedMinsumDecoder.from_decoder(dec, params, vmem_limit_mb=126)
    B = 8192
    sigma = float(chan.sigma[0])

    @jax.jit
    def count(app, bits):
        c = count_errors(bits, app, Convention.STANDARD)
        return c.bit_errors[-1], c.frame_errors[-1]

    be = fe = words = 0
    t0 = time.time()
    key = jax.random.PRNGKey(977)
    for b in range(args.randcw_batches):
        key, sub = jax.random.split(key)
        llr, bits = chan.sample_randcw_at_sigma(sub, B, sigma)
        b_be, b_fe = count(fused(llr), bits)
        be += int(b_be); fe += int(b_fe); words += B
        print(f"[randcw] batch {b+1}/{args.randcw_batches}: "
              f"fe={fe} be={be} words={words}", flush=True)
    fer = fe / words
    results["randcw"] = {
        "tag": tag, "Z": EVAL_Z, "snr_db": args.randcw_snr, "words": words,
        "frame_errors": fe, "bit_errors": be, "fer": fer,
        "ber": be / (words * code.n_bits),
        "wall_s": round(time.time() - t0, 1),
        "note": "random codewords via the QC generator (traced-argument "
                "path) — compare with eval_<tag> fer at the same SNR "
                "(all-zero): agreement confirms codeword-independence",
    }
    save_results(results)
    print(f"[randcw] {json.dumps(results['randcw'])}", flush=True)


def stage_liftstudy(args, results):
    """How small can the training lift be?  Train the high-SNR-mix ITER
    variant at each study lift, serve at Z=384, and compare the 2.25/2.5 dB
    FER against the Z=256-trained 'hi' run and plain MS.  Shifts mod Z differ
    per lift (same basegraph), so this probes protograph-level universality
    of the learned schedule, not just shape compatibility."""
    sharing, train_snrs, iter_start = VARIANTS["hi"]
    snrs = tuple(float(s) for s in args.snrs.split(","))
    for Zt in (int(z) for z in args.study_zs.split(",")):
        key = f"liftstudy_z{Zt}"
        if key in results and not args.force:
            print(f"[{key}] already recorded", flush=True)
            continue
        code, dec = build_decoder(Zt, sharing)
        chan = AWGNChannel(code, ChannelConfig(snr_db=train_snrs))
        cfg = TrainConfig(
            total_epochs=args.epochs, batch_size=64,
            train_words_per_epoch=64 * args.steps_per_epoch,
            validate_words=1024, engine="fused", is_y_all_zero=True,
            training_iter_start=iter_start,
            learning_rate=LearningRate(2e-3, 0.0, 0), grad_clip_norm=1.0,
            validate_epoch_step=10**9, checkpoint_step=10**9,
            checkpoint_dir=os.path.join(REPO, "trained", "bg1_train_r5_ckpt"),
            export_weights_txt=False, seed=2042, verbose=False,
        )
        t0 = time.time()
        params, _, _ = Trainer(dec, chan, cfg).train()
        train_s = time.time() - t0
        np.savez(ckpt_path("hi", Zt), **{k: np.asarray(v) for k, v in params.items()})
        print(f"[{key}] trained in {train_s:.0f}s; eval at Z={EVAL_Z}", flush=True)

        codeE, decE = build_decoder(EVAL_Z, sharing)
        chanE = AWGNChannel(codeE, ChannelConfig(snr_db=snrs))
        camp = MonteCarloCampaign(decE, params, chanE, CampaignConfig(
            batch_size=8192, min_frame_errors=args.min_fe,
            max_words_per_snr=args.max_words, engine="fused",
            sync_every_batches=8, seed=31337,
            fused_stats_mode=False, fused_kwargs={"vmem_limit_mb": 126}))
        camp.run(verbose=True)
        res = camp.results()
        base = results.get("eval_base", {})
        fers = [res[s]["fer"][-1] for s in snrs]
        results[key] = {
            "train_z": Zt, "eval_z": EVAL_Z, "train_wall_s": round(train_s, 1),
            "train_snrs_db": list(train_snrs),
            "weights": {k: np.asarray(v).ravel().round(4).tolist()
                        for k, v in params.items()},
            "snrs_db": list(snrs), "words": [int(w) for w in camp.words],
            "fer": fers,
            "fer_ratio_vs_base": [
                fers[i] / base["fer"][base["snrs_db"].index(s)]
                if base and s in base.get("snrs_db", []) and
                base["fer"][base["snrs_db"].index(s)] > 0 else None
                for i, s in enumerate(snrs)],
        }
        save_results(results)
        print(f"[{key}] {json.dumps(results[key]['fer_ratio_vs_base'])}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["train", "eval", "randcw", "liftstudy"])
    ap.add_argument("--study-zs", default="16,64")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    ap.add_argument("--snrs", default="2.25,2.5,2.75,3.0")
    ap.add_argument("--min-fe", type=int, default=100)
    ap.add_argument("--max-words", type=int, default=12_000_000)
    ap.add_argument("--eval-tags", default="cn3,deg6")
    ap.add_argument("--randcw-snr", type=float, default=2.5)
    ap.add_argument("--randcw-batches", type=int, default=128)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--train-tags", default="cn3,deg6")
    ap.add_argument("--result-suffix", default="",
                    help="append to eval_/gain_ result keys (extension runs)")
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    results = load_results()
    {"train": stage_train, "eval": stage_eval, "randcw": stage_randcw,
     "liftstudy": stage_liftstudy}[args.stage](args, results)


if __name__ == "__main__":
    main()
