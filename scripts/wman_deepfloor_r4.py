"""Round-4 wman error-floor suppression at the DEEP floor (VERDICT item 2).

Round 3 mapped the wman MS x10 floor (FER 8.4e-9 @5.75 dB / 3.3e-9 @6.0 dB,
38.8B words); the mid-SNR two-stage attempts were statistically neutral
because the pool words (harvested @4.5 dB) do not represent the floor
population.  This script harvests failures where the floor actually lives
and evaluates the Kwak two-stage system there, all made feasible by the
round-4 syndrome-gated early-exit machinery (ops/pallas emit_syndrome +
scatter compaction):

  harvest   EE-accelerated sweep at 5.3/5.5 dB: phase-1 MS x3 decode with
            the in-kernel syndrome flag accepts ~all words; escalations are
            re-decoded with the full x10 unroll and TRUE failures (frame
            errors) stream to the pool npz.  Restartable (pool + counters
            saved every sync).
  finetune  UCN-row fine-tune of the r2 extended-13 decoder
            (trained/wman_ms13_deepfloor_ft.npz) on the deep pool.
  eval      PAIRED two-stage deep eval at 5.5/5.75 dB: per batch, phase-1
            accepts; escalations get the full base-10 decode (base FER);
            base syndrome failures get the extended-13 post decode (system
            FER).  Base and system counters come from identical words, so
            the FER ratio is paired.

Reference semantics being proven at scale:
/root/reference/src/boosted_neural_ldpc_decoder/BoostedNeuralLDPCDecoder.py:339-374,431-503
(UCN-routed post-iteration boosting, Kwak et al. arXiv:2310.07194).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASE_NPZ = os.path.join(REPO, "trained", "wman_ms10_base75ep.npz")
EXT_FT_NPZ = os.path.join(REPO, "trained", "wman_ms13_deepfloor.npz")
DEEP_NPZ = os.path.join(REPO, "trained", "wman_ms13_deepfloor_r4.npz")
POOL_NPZ = os.path.join(REPO, "trained", "wman_deepfloor_r4_pool.npz")
OUT = os.path.join(REPO, "benchmarks", "wman_deepfloor_r4.json")

BATCH = int(os.environ.get("DF_BATCH", 262144))
EE_ITERS = int(os.environ.get("DF_EE_ITERS", 3))
EE_CAP = int(os.environ.get("DF_EE_CAP", 8192))


def _stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build():
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import TannerGraph, get_code
    from neural_ldpc_tpu.models import BoostedDecoderConfig
    from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig, SharingMode
    from neural_ldpc_tpu.training import LearningRate, TrainConfig
    from neural_ldpc_tpu.training.boosted_pipeline import (
        BoostedPipeline, BoostedPipelineConfig,
    )

    code = get_code("wman_n576_r34_z24")
    graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
    channel = AWGNChannel(code, ChannelConfig(snr_db=(5.0, 5.25, 5.5)))
    base_cfg = BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=SharingMode.ITER, ucn=SharingMode.NONE,
                                        vn=SharingMode.ITER))
    post_train = TrainConfig(
        total_epochs=60, batch_size=1024,
        train_words_per_epoch=1024 * 100, validate_words=1024 * 16,
        learning_rate=LearningRate(2e-4, 0.0, 0),
        engine="fused", patience=10, validate_epoch_step=5,
        checkpoint_step=60, log_metrics_step=5, progress_step=1000,
        checkpoint_dir="checkpoints/wman_deepfloor_r4", seed=4242,
        export_weights_txt=False, is_y_all_zero=True,
    )
    pipe = BoostedPipeline(
        graph, channel, base_cfg, post_train, post_train,
        BoostedPipelineConfig(
            base_iters=10, post_iters=3,
            post_ucn_sharing=SharingMode.NODE_ITER,
            post_train_ucn_only=False,
            collect_words=50_000, collect_batch_size=BATCH,
            collect_snr_index=-1, max_collect_batches=200_000, seed=4242,
            pool_mix_ratio=0.5,
        ),
    )
    base_params = {k: jnp.asarray(v) for k, v in np.load(BASE_NPZ).items()
                   if k.startswith("weight")}
    return code, graph, channel, pipe, base_params


def _ee_decoders(pipe, base_params):
    """(phase1, full base-10) fused decoders in stats-only mode: each call
    returns (syndrome_ok [B], bit_errors [B], frame_error [B]) and the APP
    never leaves the kernel (all-zero campaign)."""
    import jax

    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
    from neural_ldpc_tpu.structs import SharingMode

    dec = pipe.base_decoder
    dcfg = dec.config
    cn_w, ucn_w, vn_w = dec._expanded_weights(base_params)
    if dcfg.sharing.ucn == SharingMode.NONE:
        ucn_w = None

    def _sl(w):
        return None if w is None else np.asarray(w)[:EE_ITERS]

    interp = jax.default_backend() == "cpu"
    phase1 = FusedMinsumDecoder(
        dec.graph, n_iterations=EE_ITERS,
        clip=(dcfg.allowed_llr_range.start, dcfg.allowed_llr_range.end),
        cn_weights=_sl(cn_w), vn_weights=_sl(vn_w), ucn_weights=_sl(ucn_w),
        emit_stats=True, interpret=interp,
    )
    full = FusedMinsumDecoder.from_decoder(dec, base_params, interpret=interp,
                                           emit_stats=True)
    return phase1, full


def _compactor(K):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def compact(llr, ok1):
        fail = ~ok1
        pos = jnp.cumsum(fail) - 1
        rows = jnp.arange(fail.shape[0], dtype=jnp.int32)
        idx = jnp.zeros(K, jnp.int32).at[
            jnp.where(fail, pos, K)
        ].set(rows, mode="drop")
        nf = fail.sum()
        valid = jnp.arange(K) < nf
        return llr[idx], valid, nf

    return compact


def stage_harvest(snrs=(5.3, 5.5), target=6000,
                  wall_budget_s=float(os.environ.get("WALL_BUDGET_S", 7200))):
    """EE-accelerated failure harvest: pool rows are TRUE base-10 failures
    (frame errors after the full unroll), not just syndrome escalations."""
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.utils.rng import split_async

    import jax as _jax
    _stamp(f"devices: {_jax.devices()}")
    code, graph, channel, pipe, base_params = build()
    _stamp("pipeline built")
    phase1, full = _ee_decoders(pipe, base_params)
    compact = _compactor(EE_CAP)
    _stamp("decoders constructed")

    pools, meta = [], {"snrs": list(snrs), "words": {}, "failures": {}}
    if os.path.exists(POOL_NPZ):
        prev = np.load(POOL_NPZ, allow_pickle=True)
        pools = [prev["llr"]]
        meta = json.loads(str(prev["meta"]))
        print(f"resuming pool: {len(prev['llr'])} rows, meta {meta}", flush=True)
    t0 = time.time()
    # the evolving key persists in meta so a resumed harvest samples FRESH
    # words instead of replaying the pool
    key = (jnp.asarray(np.array(meta["key"], np.uint32))
           if "key" in meta else jax.random.PRNGKey(42424))
    n_pool = sum(len(p) for p in pools)
    per_snr_target = max(1, target // len(snrs))

    @jax.jit
    def harvest_step(sub, sigma):
        llr, _ = pipe.channel.sample(sub, BATCH, jnp.full((BATCH,), sigma), True)
        ok1, _, _ = phase1(llr)
        sel, valid, nf = compact(llr, ok1)
        _, _, fe2 = full(sel)
        return sel, fe2 & valid, nf

    for snr in snrs:
        chan = AWGNChannel(code, ChannelConfig(snr_db=(snr,)))
        sigma = jnp.float32(chan.sigma[0])
        # compile probe: one batch, blocked, so the (slow, remote) Mosaic
        # compiles are visibly separated from the steady-state loop
        _stamp(f"@{snr}: compiling harvest_step ...")
        key, sub = split_async(key)
        _sel, _err, _nf = harvest_step(sub, sigma)
        _stamp(f"@{snr}: compiled; first batch nf={int(_nf)}")
        words = int(meta["words"].get(str(snr), 0))
        fails = int(meta["failures"].get(str(snr), 0))
        # fold the probe batch's results into the pool/counters (they are
        # minutes of TPU work in the deep waterfall; discarding them also
        # shifted the sample stream for resumed pools)
        _e = np.asarray(_err)
        if _e.any():
            import jax.numpy as _jnp
            rows = np.asarray(_jnp.take(_sel, _jnp.asarray(np.nonzero(_e)[0]),
                                        axis=0))
            pools.append(rows)
            fails += len(rows)
            n_pool += len(rows)
        words += BATCH
        meta["words"][str(snr)] = words
        meta["failures"][str(snr)] = fails
        meta["key"] = np.asarray(key).tolist()
        while (fails < per_snr_target and n_pool < target
               and time.time() - t0 < wall_budget_s):
            pend = []
            for _ in range(16):
                key, sub = split_async(key)
                pend.append(harvest_step(sub, sigma))
            for sel, err, nf in pend:
                e = np.asarray(err)
                if int(nf) > EE_CAP:
                    print(f"WARNING: {int(nf)} escalations > cap {EE_CAP} "
                          f"@{snr} dB (phase-1 too shallow?)", flush=True)
                if e.any():
                    rows = np.asarray(jnp.take(sel, jnp.asarray(np.nonzero(e)[0]),
                                               axis=0))
                    pools.append(rows)
                    fails += len(rows)
                    n_pool += len(rows)
                words += BATCH
            meta["words"][str(snr)] = words
            meta["failures"][str(snr)] = fails
            meta["key"] = np.asarray(key).tolist()
            wps = words / max(time.time() - t0, 1e-9)
            print(f"@{snr}: {words:,} words, {fails} failures "
                  f"(pool {n_pool}), {wps:,.0f} w/s", flush=True)
            allp = np.concatenate(pools) if pools else np.zeros((0, code.N, code.Z), np.float32)
            np.savez(POOL_NPZ, llr=allp, bits=np.zeros((len(allp), code.N * code.Z), np.float32),
                     meta=json.dumps(meta))
        # reset the per-SNR loop budget check for the next point
    print(json.dumps({"stage": "harvest", "pool": n_pool, "meta": meta,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


def stage_finetune(pool_ratio=0.5, epochs=60):
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.codes import get_code
    from neural_ldpc_tpu.training import LearningRate, Trainer

    code, graph, channel, pipe, base_params = build()
    d = np.load(POOL_NPZ, allow_pickle=True)
    if os.path.exists(EXT_FT_NPZ):
        # warm-start from the r2 extended-13 decoder (trained on the mid-SNR
        # pool); the r4 fine-tune re-aims its UCN rows at the deep pool
        ext_params = {k: jnp.asarray(v) for k, v in np.load(EXT_FT_NPZ).items()
                      if k.startswith("weight")}
    else:
        ext_params = pipe.transfer_base_params(base_params)
    rng = np.random.default_rng(77)
    pipe.cfg.pool_mix_ratio = pool_ratio
    pipe.channel = AWGNChannel(code, ChannelConfig(snr_db=(5.0, 5.25)))
    datagen = pipe.make_post_datagen(d["llr"], d["bits"], rng)
    tc = dataclasses.replace(
        pipe.post_train, total_epochs=epochs,
        train_only_params=("weight_ucn",),
        learning_rate=LearningRate(2e-4, 0.0, 0),
        checkpoint_dir="checkpoints/wman_deepfloor_r4_ft")
    trainer = Trainer(pipe.post_decoder, pipe.channel, tc, host_datagen=datagen)
    t0 = time.time()
    params, _, rep = trainer.train(params=ext_params)
    np.savez(DEEP_NPZ, **{k: np.asarray(v) for k, v in params.items()})
    print(json.dumps({"stage": "finetune", "wall_s": round(time.time() - t0, 1)}),
          flush=True)


def stage_eval(snrs=(5.5, 5.75), target_base_errors=200,
               wall_budget_s=float(os.environ.get("WALL_BUDGET_S", 10800)),
               ext_npz=None, tag="wman_deepfloor_r4"):
    """Paired two-stage deep eval: base FER and system FER on IDENTICAL
    words.  Words: phase-1 accept (counted from phase-1 APP for both) ->
    full base-10 on escalations (base counts) -> extended-13 post decode on
    base syndrome failures (system counts)."""
    import jax
    import jax.numpy as jnp

    from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
    from neural_ldpc_tpu.ops.pallas.minsum import FusedMinsumDecoder
    from neural_ldpc_tpu.utils.rng import split_async

    code, graph, channel, pipe, base_params = build()
    phase1, full = _ee_decoders(pipe, base_params)
    compact = _compactor(EE_CAP)
    ext_npz = ext_npz or (DEEP_NPZ if os.path.exists(DEEP_NPZ) else EXT_FT_NPZ)
    ext_params = {k: jnp.asarray(v) for k, v in np.load(ext_npz).items()
                  if k.startswith("weight")}
    post = FusedMinsumDecoder.from_decoder(
        pipe.post_decoder, ext_params, emit_stats=True,
        interpret=jax.default_backend() == "cpu")

    @jax.jit
    def eval_step(sub, sigma):
        llr, _ = pipe.channel.sample(sub, BATCH, jnp.full((BATCH,), sigma), True)
        ok1, _, fe1 = phase1(llr)
        e1 = (fe1 & ok1).sum()  # accepted from phase 1: base AND system error
        sel, valid, nf = compact(llr, ok1)
        ok2, _, fe2 = full(sel)
        b_fe = (fe2 & valid).sum()  # base frame errors among escalations
        s_del = (fe2 & ok2 & valid).sum()  # base-delivered miscorrections
        to_post = (~ok2) & valid
        _, _, fe3 = post(sel)
        s_post = (fe3 & to_post).sum()
        # one stacked vector so windows can reduce ON DEVICE (a per-batch
        # scalar fetch costs a ~25 ms tunnel round trip; six of them per
        # batch capped the r4 eval at 1.5M w/s)
        return jnp.stack([e1, b_fe, s_del, s_post, to_post.sum(), nf]
                         ).astype(jnp.int32)

    @jax.jit
    def merge(acc, r):
        s, m = acc
        return s + r, jnp.maximum(m, r[5])

    state_path = os.path.join(REPO, "trained", f"{tag}_eval_state.json")
    st = {"points": {str(s): {"words": 0, "base_fe": 0, "sys_fe": 0,
                              "escalated": 0, "post_invoked": 0}
                     for s in snrs}, "key": None}
    if os.path.exists(state_path):
        st = json.load(open(state_path))
        print("resuming eval state", st["points"], flush=True)
    key = (jnp.asarray(np.array(st["key"], np.uint32)) if st.get("key")
           else jax.random.PRNGKey(777001))
    t0 = time.time()

    out_path = os.path.join(REPO, "benchmarks", f"{tag}.json")

    def flush_json():
        out = {"tag": tag, "ext_npz": os.path.basename(ext_npz),
               "ee_iters": EE_ITERS, "points": {}}
        for s in snrs:
            p = st["points"][str(s)]
            w = max(p["words"], 1)
            out["points"][str(s)] = dict(
                p, base_fer=p["base_fe"] / w, system_fer=p["sys_fe"] / w,
                ratio=(p["sys_fe"] / max(p["base_fe"], 1)))
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    for snr in snrs:
        chan = AWGNChannel(code, ChannelConfig(snr_db=(snr,)))
        sigma = jnp.float32(chan.sigma[0])
        p = st["points"][str(snr)]
        while (p["base_fe"] < target_base_errors
               and time.time() - t0 < wall_budget_s):
            acc = None
            for _ in range(64):
                key, sub = split_async(key)
                r = eval_step(sub, sigma)
                acc = (r, r[5]) if acc is None else merge(acc, r)
            s, m = np.asarray(acc[0]), int(acc[1])  # ONE fetch per window
            if m > EE_CAP:
                print(f"WARNING: escalation overflow {m}", flush=True)
            e1, b_fe, s_del, s_post, n_post, nf = (int(v) for v in s)
            p["words"] += BATCH * 64
            p["base_fe"] += e1 + b_fe
            p["sys_fe"] += e1 + s_del + s_post
            p["escalated"] += nf
            p["post_invoked"] += n_post
            st["key"] = np.asarray(key).tolist()
            json.dump(st, open(state_path, "w"))
            flush_json()
            wps = p["words"] / max(time.time() - t0, 1e-9)
            print(f"@{snr}: {p['words']:,} w, base_fe {p['base_fe']}, "
                  f"sys_fe {p['sys_fe']}, esc {p['escalated']}, "
                  f"{wps:,.0f} w/s", flush=True)
    flush_json()
    print(json.dumps({"stage": "eval", "out": out_path}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["harvest", "finetune", "eval", "all"])
    ap.add_argument("--ext", default=None)
    ap.add_argument("--snrs", default=None,
                    help="comma-separated eval SNRs (default 5.5,5.75)")
    ap.add_argument("--target", type=int, default=200,
                    help="base frame errors per eval point")
    ap.add_argument("--tag", default="wman_deepfloor_r4",
                    help="eval artifact/state name (benchmarks/<tag>.json)")
    args = ap.parse_args()
    if args.stage in ("harvest", "all"):
        stage_harvest()
    if args.stage in ("finetune", "all"):
        stage_finetune()
    if args.stage in ("eval", "all"):
        kw = dict(ext_npz=args.ext, target_base_errors=args.target,
                  tag=args.tag)
        if args.snrs:
            kw["snrs"] = tuple(float(s) for s in args.snrs.split(","))
        stage_eval(**kw)


if __name__ == "__main__":
    main()
