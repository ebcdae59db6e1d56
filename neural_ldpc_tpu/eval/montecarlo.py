"""Monte-Carlo BER/FER campaign engine.

The reference has no evaluation campaign tooling beyond the inline validation
loop (train/…:328-399); this is the production SNR-sweep engine the BASELINE
configs call for: a single jitted generate->decode->count step per batch,
batch sharded over the device mesh (counts reduce globally inside jit),
early stopping per SNR point at a target frame-error count, and fully
checkpointable/restartable state (counters + PRNG key) for 1e9-word runs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.awgn import AWGNChannel
from ..eval.metrics import ErrorCounts, count_errors
from ..parallel import mesh as meshlib
from ..utils.checkpoint import CheckpointManager
from ..utils.rng import split_async


@dataclasses.dataclass
class CampaignConfig:
    batch_size: int = 1024
    max_words_per_snr: int = 1_000_000
    min_frame_errors: int = 100  # stop an SNR point once reached (0 = never)
    all_zero: bool = True
    seed: int = 2042
    checkpoint_dir: Optional[str] = None
    checkpoint_every_batches: int = 200
    # decode engine: "xla" = decoder.apply; "fused" = the fused Pallas kernel
    # (~5x+ faster on TPU, ops/pallas/minsum.py); "auto" = fused when the
    # decoder is eligible and a TPU is present, else xla.
    engine: str = "auto"
    # fused engine: per-iteration BER/FER stats (smaller batch tile) instead
    # of final-iteration only
    fused_all_iterations: bool = False
    # fetch counters from device every N batches: >1 keeps the dispatch
    # pipeline full (a per-batch fetch costs a full round-trip, ~20 ms on a
    # tunneled TPU) at the cost of early-stop granularity
    sync_every_batches: int = 1
    # Syndrome-gated early exit (round 4): decode every word with only this
    # many iterations first; words whose hard decisions satisfy every lifted
    # check are accepted from phase 1, the rest are compacted and re-decoded
    # from scratch with the full unroll.  In the waterfall/floor regime
    # nearly every word converges in 2-3 iterations, so campaign throughput
    # approaches (I / early_exit_iters) x.  None = always full unroll.
    # Semantics note: an accepted word that converged to a WRONG codeword is
    # counted from its phase-1 output; the full unroll, continuing from the
    # same fixed point, produces the same decision in every observed case
    # (benchmarks/early_exit_r4.json pins counter equality on billions of
    # words) but equality is empirical, not guaranteed.
    early_exit_iters: Optional[int] = None
    # max escalations per batch before the batch is re-decoded exactly with
    # the full unroll (drain() detects the overflow and redoes that batch).
    # None (round 5): max(4096, batch_size // 64) — a FIXED 4096 cap meant
    # 1M-word batches overflowed on every window at 5.0 dB (escalation rate
    # ~0.5%) and EE ran 0.71x; capacity must scale with the batch.
    early_exit_capacity: Optional[int] = None
    # Round 5: measure before trusting — at the first window of each SNR
    # point, time a short burst of EE steps against the exact full-unroll
    # step and keep whichever is faster FOR THAT POINT.  In the high-error
    # regime the escalation rate makes EE net-negative (0.64x at 4.0 dB,
    # benchmarks/early_exit_r4.json); the guard makes early_exit_iters safe
    # to leave on for a whole sweep.  Probe batches' counters are folded in
    # (no words are wasted).  False = always EE (r4 behavior).
    early_exit_auto_guard: bool = True
    early_exit_probe_batches: int = 8
    # Round 5: sample the AWGN channel INSIDE the decode kernel (stats-only
    # all-zero campaigns, single device, VMEM-resident codes).  The r4 trace
    # (benchmarks/mfu_r4.json ee_step_trace) measured XLA threefry sampling
    # at 36.4 ns/word — as much as the phase-1 x3 decode itself; in-kernel
    # Box-Muller over a counter-hash removes it plus the [NZp, B] HBM llr
    # round-trip.  DIFFERENT random stream than jax.random (statistically
    # equivalent, deterministic per seed); counters remain exactly
    # reproducible for a given config.  "auto" = on when eligible.
    kernel_channel_sampling: str = "off"  # "off" | "on" | "auto"
    # all-zero final-only campaigns normally ride the stats-only kernel
    # (fastest).  At the full BG1 Z=384 lift its syndrome/stats epilogue
    # pushes Mosaic's register spills past physical VMEM (measured 129.23 MB
    # of 128; the plain APP decode fits at a 126 MB budget) — set False to
    # use the APP + XLA-count composition instead.
    fused_stats_mode: bool = True
    # extra kwargs for the fused decoder constructors (e.g. vmem_limit_mb)
    fused_kwargs: Optional[dict] = None


class MonteCarloCampaign:
    """Sweep the channel's SNR list, decode, and accumulate error counters.

    Results: dict snr_db -> {words, per-iteration ber/fer arrays}.  State can
    be saved/restored mid-campaign (SURVEY.md §5 failure-recovery equivalent:
    restartable counters + key).
    """

    def __init__(
        self,
        decoder,
        params,
        channel: AWGNChannel,
        config: CampaignConfig = CampaignConfig(),
        mesh=None,
    ):
        self.decoder = decoder
        self.params = params
        self.channel = channel
        self.cfg = config
        self.mesh = mesh
        self.n_iters = decoder.config.n_iterations
        self.fused = self._resolve_engine() == "fused"
        self.ee = config.early_exit_iters is not None
        if self.ee:
            if not self.fused:
                raise ValueError("early_exit_iters requires the fused engine")
            if config.fused_all_iterations:
                raise ValueError("early exit produces final-iteration stats only")
            if mesh is not None and not config.all_zero:
                raise ValueError("mesh early exit rides the stats-only kernel "
                                 "(all_zero campaigns); drop the mesh, the "
                                 "early_exit_iters, or set all_zero")
            if not (0 < config.early_exit_iters < self.n_iters):
                raise ValueError("early_exit_iters must be in (0, n_iterations)")
        if config.kernel_channel_sampling == "on" and (
            mesh is not None or not config.all_zero or config.fused_all_iterations
        ):
            raise ValueError("kernel_channel_sampling='on' needs the single-"
                             "device stats mode (all_zero, final-only, no "
                             "mesh); use 'auto' to fall back silently")
        S = len(channel.sigma)
        n_cols = 1 if self.fused and not config.fused_all_iterations else self.n_iters
        self.key = jax.random.PRNGKey(config.seed)
        self.words = np.zeros(S, np.int64)
        self.bit_errors = np.zeros((S, n_cols), np.float64)
        self.frame_errors = np.zeros((S, n_cols), np.float64)
        self._ee_choice: dict = {}  # per-SNR-point auto-guard decisions
        self._build_step()

    def _fused_eligible(self) -> bool:
        from ..ops.pallas.fused_train import fused_capacity_ok
        from ..structs import Convention

        # odd-Z codes ride the streaming-kernel delegation inside
        # FusedMinsumDecoder; the remaining constraints are the REFERENCE
        # parity convention and the VMEM message-residency capacity
        from ..structs import DecoderType

        return (
            self.decoder.config.convention != Convention.REFERENCE
            and fused_capacity_ok(
                self.decoder.graph,
                qms=self.decoder.config.decoder_type == DecoderType.QMS,
            )
        )

    def _resolve_engine(self) -> str:
        if self.cfg.engine == "xla":
            return "xla"
        if self.cfg.engine == "fused":
            if not self._fused_eligible():
                raise ValueError("decoder/config not eligible for the fused kernel")
            return "fused"
        on_accelerator = jax.default_backend() != "cpu"
        return "fused" if on_accelerator and self._fused_eligible() else "xla"

    def _build_step(self):
        """Bake the per-batch steps: ``self._exact_step`` (full unroll,
        always), ``self._ee_step`` (syndrome-gated early exit, None unless
        configured), and the window-overflow threshold ``self._ee_cap``
        (per-device in mesh mode)."""
        convention = self.decoder.config.convention
        channel, decoder, cfg = self.channel, self.decoder, self.cfg
        self._ee_step = None
        cap = (cfg.early_exit_capacity if cfg.early_exit_capacity is not None
               else max(4096, cfg.batch_size // 64))
        self._ee_cap = min(cap, cfg.batch_size)
        self.kernel_sampling = False

        if self.fused:
            from jax.sharding import PartitionSpec as P

            from ..ops.pallas.minsum import FusedMinsumDecoder

            interp = jax.default_backend() == "cpu"
            nz_bits = float(self.decoder.graph.N * self.decoder.graph.Z)

            fkw = cfg.fused_kwargs or {}
            fused = FusedMinsumDecoder.from_decoder(
                decoder, self.params,
                all_iterations=cfg.fused_all_iterations,
                interpret=interp, **fkw,
            )

            # ---- early-exit building blocks (shared by mesh/single) ----
            if self.ee:
                from ..structs import DecoderType, SharingMode

                I1 = cfg.early_exit_iters
                dcfg = decoder.config
                cn_w, ucn_w, vn_w = decoder._expanded_weights(self.params)
                if dcfg.sharing.ucn == SharingMode.NONE:
                    ucn_w = None

                def _sl(w):
                    return None if w is None else np.asarray(w)[:I1]

                p1_kw = dict(
                    clip=(dcfg.allowed_llr_range.start,
                          dcfg.allowed_llr_range.end),
                    qms_qbit=(dcfg.qms_qbit
                              if dcfg.decoder_type == DecoderType.QMS
                              else None),
                    cn_weights=_sl(cn_w), vn_weights=_sl(vn_w),
                    ucn_weights=_sl(ucn_w),
                    sum_product=dcfg.decoder_type == DecoderType.SP,
                    interpret=interp,
                )

            def _compact_idx(ok1, K):
                # scatter-compact the failed rows into K slots (argsort over
                # the 256k-word batches costs more than phase 1 itself)
                fail = ~ok1
                # slot j holds the (j+1)-th failed row: binary-search the
                # failure-count prefix sum instead of scattering B updates
                # into K slots (the TPU kCustom scatter emulation cost
                # 4.8 ms/batch at B=1M — 60x this formulation; mfu_r4.json
                # ee_step_trace)
                c = jnp.cumsum(fail.astype(jnp.int32))
                idx = jnp.searchsorted(
                    c, jnp.arange(1, K + 1, dtype=jnp.int32)
                ).astype(jnp.int32)
                idx = jnp.minimum(idx, fail.shape[0] - 1)
                nf = c[-1]
                valid = jnp.arange(K) < nf
                return idx, valid, nf

            def _counts(be, fe, frames):
                return ErrorCounts(
                    bit_errors=jnp.stack([be]),
                    total_bits=jnp.asarray(frames * nz_bits, jnp.float32),
                    frame_errors=jnp.stack([fe]),
                    total_frames=jnp.asarray(frames, jnp.float32),
                )

            if self.mesh is not None:
                n_dev = int(np.prod(self.mesh.devices.shape))
                if cfg.batch_size % n_dev:
                    raise ValueError(
                        f"batch_size {cfg.batch_size} not divisible by "
                        f"{n_dev} mesh devices"
                    )
                per_dev = cfg.batch_size // n_dev
                axis = self.mesh.axis_names[0]

                def shard_fn(key, sigma):
                    k = jax.random.fold_in(key, jax.lax.axis_index(axis))
                    llr, bits = channel.sample(
                        k, per_dev, jnp.full((per_dev,), sigma), cfg.all_zero
                    )
                    out = fused(llr)
                    if not cfg.fused_all_iterations:
                        out = out[None]
                    c = count_errors(bits, out, convention)
                    return jax.tree.map(lambda v: jax.lax.psum(v, axis), c)

                self._exact_step = jax.jit(
                    jax.shard_map(
                        shard_fn, mesh=self.mesh, in_specs=(P(), P()),
                        out_specs=P(), check_vma=False,
                    )
                )

                if self.ee:
                    # mesh early exit (round 5, VERDICT r4 item 5): phase-1
                    # stats decode + SHARD-LOCAL compaction + full re-decode
                    # per shard; counts psum, per-batch escalation max pmax.
                    # The overflow threshold (early_exit_capacity) is per
                    # DEVICE; an overflowing window is redone exactly by the
                    # mesh full-unroll step on the same keys.
                    fused_stats = FusedMinsumDecoder.from_decoder(
                        decoder, self.params, emit_stats=True, interpret=interp
                    )
                    phase1 = FusedMinsumDecoder(
                        decoder.graph, n_iterations=I1, emit_stats=True, **p1_kw
                    )
                    K = max(1, min(self._ee_cap, per_dev))
                    self._ee_cap = K

                    def ee_shard_fn(key, sigma):
                        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
                        llr, _ = channel.sample(
                            k, per_dev, jnp.full((per_dev,), sigma), True
                        )
                        ok1, be1v, fe1v = phase1(llr)
                        be1 = (be1v * ok1).sum()
                        fe1 = (fe1v & ok1).sum().astype(jnp.float32)
                        idx, valid, nf = _compact_idx(ok1, K)
                        _, be2v, fe2v = fused_stats(llr[idx])
                        be2 = (be2v * valid).sum()
                        fe2 = (fe2v & valid).sum().astype(jnp.float32)
                        c = _counts(be1 + be2, fe1 + fe2, per_dev)
                        c = jax.tree.map(lambda v: jax.lax.psum(v, axis), c)
                        return c, jax.lax.pmax(nf, axis)

                    self._ee_step = jax.jit(
                        jax.shard_map(
                            ee_shard_fn, mesh=self.mesh, in_specs=(P(), P()),
                            out_specs=(P(), P()), check_vma=False,
                        )
                    )
                self._step = self._ee_step if self.ee else self._exact_step
                return

            count = jax.jit(partial(count_errors, convention=convention))

            # all-zero final-only campaigns ride the stats-only kernel in a
            # SINGLE jit per batch (round 4): the APP never leaves the kernel
            # and the whole sample->decode->count chain is one dispatch —
            # measured 4.8M -> 13M+ words/s on the wman deep-waterfall
            # workload (the old jit-boundary composition existed to dodge a
            # round-1 scoped-vmem OOM that the stream kernel does not have)
            stats_mode = (cfg.all_zero and not cfg.fused_all_iterations
                          and cfg.fused_stats_mode)

            if cfg.kernel_channel_sampling not in ("off", "on", "auto"):
                raise ValueError("kernel_channel_sampling: off | on | auto")
            sampled_full = None
            if cfg.kernel_channel_sampling != "off" and stats_mode:
                try:
                    sampled_full = FusedMinsumDecoder.from_decoder(
                        self.decoder, self.params, emit_stats=True,
                        sample_channel=True, interpret=interp, **fkw,
                    )
                except ValueError:
                    if cfg.kernel_channel_sampling == "on":
                        raise
            self.kernel_sampling = sampled_full is not None

            def _seed_of(key):
                # one scalar threefry draw per batch keys the in-kernel
                # counter hash (each tile further mixes its program id)
                return jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)

            if stats_mode:
                fused_stats = FusedMinsumDecoder.from_decoder(
                    self.decoder, self.params, emit_stats=True,
                    interpret=interp, **fkw,
                )

                if self.kernel_sampling:
                    @jax.jit
                    def fused_step(key, sigma):
                        ok, be, fe = sampled_full.sample_stats(
                            _seed_of(key), sigma, cfg.batch_size
                        )
                        return ErrorCounts(
                            bit_errors=jnp.stack([be.sum()]),
                            total_bits=jnp.asarray(
                                cfg.batch_size * nz_bits, jnp.float32),
                            frame_errors=jnp.stack(
                                [fe.sum().astype(jnp.float32)]),
                            total_frames=jnp.asarray(
                                cfg.batch_size, jnp.float32),
                        )
                else:
                    @jax.jit
                    def fused_step(key, sigma):
                        llr, _ = channel.sample(
                            key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), True
                        )
                        _, be, fe = fused_stats(llr)
                        return ErrorCounts(
                            bit_errors=jnp.stack([be.sum()]),
                            total_bits=jnp.asarray(cfg.batch_size * nz_bits, jnp.float32),
                            frame_errors=jnp.stack([fe.sum().astype(jnp.float32)]),
                            total_frames=jnp.asarray(cfg.batch_size, jnp.float32),
                        )
            else:
                def fused_step(key, sigma):
                    # composed from separately-jitted stages: inlining keeps
                    # the full [I, NZ, B] all-iterations stream off VMEM
                    llr, bits = channel.sample(
                        key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), cfg.all_zero
                    )
                    out = fused(llr)  # [B, N*Z] final APP, or [I, B, N*Z]
                    if not cfg.fused_all_iterations:
                        out = out[None]
                    return count(bits, out)

            self._exact_step = fused_step
            if not self.ee:
                self._step = fused_step
                return

            # ---- syndrome-gated early exit (round 4, VERDICT item 3) ----
            # phase 1: truncated unroll with the in-kernel syndrome epilogue;
            # accepted words (syndrome satisfied) are counted from their
            # phase-1 APP.  phase 2: failures are scatter-compacted into a
            # fixed-capacity bucket and re-decoded from scratch with the full
            # unroll (bit-identical to the full path for those words).
            # Overflow windows are re-done exactly by flush() via the
            # untruncated step above.
            K = self._ee_cap

            if stats_mode:
                if self.kernel_sampling:
                    # phase 1 samples IN KERNEL; compacted escalations
                    # RE-SAMPLE their words in kernel from the same
                    # (seed, index) counter stream — the sampled llr never
                    # touches HBM in either phase.  (Exporting phase 1's llr
                    # and gathering escalations from it cost two full-batch
                    # HBM passes — 13-20% of EE device time at 1M-word
                    # batches, mfu_r4.json ee_step_trace.)  The sampled
                    # full-unroll step (same seed derivation, same batch
                    # tile) generates identical words, so overflow redos and
                    # the auto-guard probe stay exact.
                    phase1 = FusedMinsumDecoder(
                        decoder.graph, n_iterations=I1, emit_stats=True,
                        sample_channel=True, bt=sampled_full.bt, **p1_kw
                    )
                    esc = FusedMinsumDecoder.from_decoder(
                        self.decoder, self.params, emit_stats=True,
                        sample_channel=True, sample_at_idx=sampled_full.bt,
                        interpret=interp, **fkw,
                    )

                    @jax.jit
                    def ee_step(key, sigma):
                        seed = _seed_of(key)
                        ok1, be1v, fe1v = phase1.sample_stats(
                            seed, sigma, cfg.batch_size
                        )
                        be1 = (be1v * ok1).sum()
                        fe1 = (fe1v & ok1).sum().astype(jnp.float32)
                        idx, valid, nf = _compact_idx(ok1, K)
                        _, be2v, fe2v = esc.stats_sampled_at(seed, sigma, idx)
                        be2 = (be2v * valid).sum()
                        fe2 = (fe2v & valid).sum().astype(jnp.float32)
                        return _counts(be1 + be2, fe1 + fe2, cfg.batch_size), nf

                    self._ee_step = self._step = ee_step
                    return

                phase1 = FusedMinsumDecoder(
                    decoder.graph, n_iterations=I1, emit_stats=True, **p1_kw
                )

                @jax.jit
                def ee_step(key, sigma):
                    llr, _ = channel.sample(
                        key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), True
                    )
                    ok1, be1v, fe1v = phase1(llr)
                    be1 = (be1v * ok1).sum()
                    fe1 = (fe1v & ok1).sum().astype(jnp.float32)
                    idx, valid, nf = _compact_idx(ok1, K)
                    _, be2v, fe2v = fused_stats(llr[idx])
                    be2 = (be2v * valid).sum()
                    fe2 = (fe2v & valid).sum().astype(jnp.float32)
                    return _counts(be1 + be2, fe1 + fe2, cfg.batch_size), nf

                self._ee_step = self._step = ee_step
                return

            phase1 = FusedMinsumDecoder(
                decoder.graph, n_iterations=I1, emit_syndrome=True, **p1_kw
            )

            @jax.jit
            def _masked_count(bits, app, include):
                dec = (app < 0).astype(jnp.int32)
                errs = (dec != bits.astype(jnp.int32)).astype(jnp.float32)
                errs = errs * include[:, None].astype(jnp.float32)
                return errs.sum(), ((errs.sum(axis=1) > 0)).astype(jnp.float32).sum()

            def ee_step(key, sigma):
                llr, bits = channel.sample(
                    key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), cfg.all_zero
                )
                app1, ok1 = phase1(llr)
                be1, fe1 = _masked_count(bits, app1, ok1)
                idx, valid, nf = _compact_idx(ok1, K)
                app2 = fused(llr[idx])
                be2, fe2 = _masked_count(bits[idx], app2, valid)
                return _counts(be1 + be2, fe1 + fe2, cfg.batch_size), nf

            self._ee_step = self._step = ee_step
            return

        def step(params, key, sigma):
            llr, bits = channel.sample(
                key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), cfg.all_zero
            )
            outputs = decoder.apply(params, llr)
            return count_errors(bits, outputs, convention)

        if self.mesh is not None:
            repl = meshlib.replicated_sharding(self.mesh)
            step = jax.jit(step, in_shardings=(repl, None, None))
        else:
            step = jax.jit(step)
        self._exact_step = self._step = lambda key, sigma: step(self.params, key, sigma)

    # ------------------------------------------------------------------
    # Window accumulation: per-batch counter fetches cost a ~25 ms round
    # trip each on a tunneled TPU — at 256k-word batches that dwarfs the
    # decode itself.  Dispatched counts are therefore tree-added ON DEVICE
    # across a sync window and fetched once per drain (round 4; the full
    # engine went 3.0M -> 11M+ words/s on the deep-waterfall workload).
    @staticmethod
    @jax.jit
    def _add_counts(a, b):
        return jax.tree.map(jnp.add, a, b)

    @staticmethod
    @jax.jit
    def _merge_ee(a, b):
        (ca, na), (cb, nb) = a, b
        return jax.tree.map(jnp.add, ca, cb), jnp.maximum(na, nb)

    def _window(self, s: int, sigma, step=None, is_ee=None):
        camp = self
        if step is None:
            step, is_ee = self._point_step(s, sigma)

        class _Window:
            """Device-side accumulator for one drain window.

            Words are counted at flush time, alongside the error counts, so
            persisted campaign state stays consistent if a device fault
            interrupts the dispatch loop (ADVICE r3).  In early-exit mode an
            overflowing window (max per-batch failures > capacity) is
            re-decoded exactly, batch by batch, with the full-unroll step —
            same keys, same words, exact counters at any SNR."""

            def __init__(self):
                self.keys = []
                self.acc = None

            def __len__(self):
                return len(self.keys)

            def dispatch(self, sub):
                r = step(sub, sigma)
                if self.acc is None:
                    self.acc = r
                elif is_ee:
                    self.acc = camp._merge_ee(self.acc, r)
                else:
                    self.acc = camp._add_counts(self.acc, r)
                self.keys.append(sub)

            def flush(self):
                if not self.keys:
                    return
                if is_ee:
                    c, nf_max = self.acc
                    if int(nf_max) > camp._ee_cap:
                        c = None
                        for sub in self.keys:
                            ce = camp._exact_step(sub, sigma)
                            c = ce if c is None else camp._add_counts(c, ce)
                else:
                    c = self.acc
                camp.words[s] += len(self.keys) * camp.cfg.batch_size
                camp.bit_errors[s] += np.asarray(c.bit_errors, np.float64)
                camp.frame_errors[s] += np.asarray(c.frame_errors, np.float64)
                self.keys = []
                self.acc = None

        return _Window()

    def _point_step(self, s: int, sigma):
        """(step, is_ee) for one SNR point: the EE step when configured, the
        exact step otherwise — with the auto-guard probing both ONCE per
        point and keeping the faster (benchmarks/early_exit_r4.json measured
        EE at 0.64x in the high-escalation regime; nothing should silently
        lose to the full unroll)."""
        if not self.ee:
            return self._exact_step, False
        if not self.cfg.early_exit_auto_guard:
            return self._ee_step, True
        if s not in self._ee_choice:
            self._ee_choice[s] = self._probe_ee(s, sigma)
        if self._ee_choice[s]:
            return self._ee_step, True
        return self._exact_step, False

    def _probe_ee(self, s: int, sigma) -> bool:
        """Time a short burst of EE vs exact steps at this sigma; counters
        from every probe batch (including the compile/warm batch) are folded
        into the campaign state, so probing wastes no words."""
        import time as _time

        n = max(self.cfg.early_exit_probe_batches, 1)
        wps = {}
        for name, step, is_ee in (("ee", self._ee_step, True),
                                  ("full", self._exact_step, False)):
            w = self._window(s, sigma, step=step, is_ee=is_ee)
            self.key, sub = split_async(self.key)
            w.dispatch(sub)
            w.flush()  # compile + warm, off the clock
            t0 = _time.perf_counter()
            for _ in range(n):
                self.key, sub = split_async(self.key)
                w.dispatch(sub)
            w.flush()  # blocks on the counter fetch
            wps[name] = n * self.cfg.batch_size / (_time.perf_counter() - t0)
        return wps["ee"] >= wps["full"]

    def run_snr_point(self, s: int, batches: int = 64) -> None:
        """Advance one SNR point by ``batches`` batches.

        Building block for callers that interleave progress reporting,
        wall-clock budgets, or partial-result flushes with the sweep
        (``run`` is the whole-sweep driver).  Dispatch is pipelined and
        drained at ``sync_every_batches`` granularity."""
        w = self._window(s, jnp.float32(self.channel.sigma[s]))
        for _ in range(batches):
            self.key, sub = split_async(self.key)
            w.dispatch(sub)
            if len(w) >= max(self.cfg.sync_every_batches, 1):
                w.flush()
        w.flush()

    def run(self, verbose: bool = True):
        cfg = self.cfg
        ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
        for s, sigma in enumerate(self.channel.sigma):
            batches_done = 0
            w = self._window(s, jnp.float32(sigma))

            # dispatched-but-undrained words count toward the budget check so
            # the sweep stops at the same point it did when words were counted
            # at dispatch time
            while self.words[s] + len(w) * cfg.batch_size < cfg.max_words_per_snr:
                if cfg.min_frame_errors and self.frame_errors[s, -1] >= cfg.min_frame_errors:
                    break
                self.key, sub = split_async(self.key)
                w.dispatch(sub)
                batches_done += 1
                if len(w) >= max(cfg.sync_every_batches, 1):
                    w.flush()
                if ckpt and batches_done % cfg.checkpoint_every_batches == 0:
                    w.flush()
                    self.save_state(ckpt)
            w.flush()
            if verbose:
                r = self.results()[float(self.channel.config.snr_db[s])]
                print(f"SNR {self.channel.config.snr_db[s]:.2f} dB: "
                      f"{int(self.words[s])} words, BER {r['ber'][-1]:.3e}, "
                      f"FER {r['fer'][-1]:.3e}")
        if ckpt:
            self.save_state(ckpt)
        return self.results()

    def results(self):
        out = {}
        nz = self.channel.code.n_bits
        for s, snr in enumerate(self.channel.config.snr_db):
            w = max(int(self.words[s]), 1)
            out[float(snr)] = {
                "words": int(self.words[s]),
                "ber": (self.bit_errors[s] / (w * nz)).tolist(),
                "fer": (self.frame_errors[s] / w).tolist(),
                "final_iter_only": self.fused and not self.cfg.fused_all_iterations,
            }
        return out

    # ------------------------------------------------------------------
    def save_state(self, ckpt: CheckpointManager, name: str = "mc_campaign"):
        ckpt.save(
            name, self.params, rng_key=self.key,
            extra_arrays={
                "words": self.words,
                "bit_errors": self.bit_errors,
                "frame_errors": self.frame_errors,
            },
        )

    def restore_state(self, ckpt: CheckpointManager, name: str = "mc_campaign"):
        params, _, _, key, extras = ckpt.load(name, self.params)
        self.params = params
        if key is not None:
            self.key = key
        self.words = extras["words"].astype(np.int64)
        self.bit_errors = extras["bit_errors"]
        self.frame_errors = extras["frame_errors"]
        self._ee_choice = {}
        self._build_step()  # rebake params (fused path captures them)
