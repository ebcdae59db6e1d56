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
from ..eval.metrics import count_errors
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
        S = len(channel.sigma)
        n_cols = 1 if self.fused and not config.fused_all_iterations else self.n_iters
        self.key = jax.random.PRNGKey(config.seed)
        self.words = np.zeros(S, np.int64)
        self.bit_errors = np.zeros((S, n_cols), np.float64)
        self.frame_errors = np.zeros((S, n_cols), np.float64)
        self._step = self._build_step()

    def _fused_eligible(self) -> bool:
        from ..ops.pallas.fused_train import fused_capacity_ok
        from ..structs import Convention

        # odd-Z codes ride the streaming-kernel delegation inside
        # FusedMinsumDecoder; the remaining constraints are the REFERENCE
        # parity convention and the VMEM message-residency capacity
        return (
            self.decoder.config.convention != Convention.REFERENCE
            and fused_capacity_ok(self.decoder.graph)
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
        convention = self.decoder.config.convention
        channel, decoder, cfg = self.channel, self.decoder, self.cfg

        if self.fused:
            from jax.sharding import PartitionSpec as P

            from ..ops.pallas.minsum import FusedMinsumDecoder

            fused = FusedMinsumDecoder.from_decoder(
                decoder, self.params,
                all_iterations=cfg.fused_all_iterations,
                interpret=jax.default_backend() == "cpu",
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

                return jax.jit(
                    jax.shard_map(
                        shard_fn, mesh=self.mesh, in_specs=(P(), P()),
                        out_specs=P(), check_vma=False,
                    )
                )

            count = jax.jit(partial(count_errors, convention=convention))

            def fused_step(key, sigma):
                # composed from separately-jitted stages on purpose: inlining
                # the pallas_call into one outer jit lets XLA try to pin the
                # kernel's whole [NZ, B] output in VMEM (scoped-vmem OOM on
                # mid-sized batches); at a jit boundary it stays in HBM
                llr, bits = channel.sample(
                    key, cfg.batch_size, jnp.full((cfg.batch_size,), sigma), cfg.all_zero
                )
                out = fused(llr)  # [B, N*Z] final APP, or [I, B, N*Z]
                if not cfg.fused_all_iterations:
                    out = out[None]
                return count(bits, out)

            return fused_step

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
        return lambda key, sigma: step(self.params, key, sigma)

    def run_snr_point(self, s: int, batches: int = 64) -> None:
        """Advance one SNR point by ``batches`` batches.

        Building block for callers that interleave progress reporting,
        wall-clock budgets, or partial-result flushes with the sweep
        (``run`` is the whole-sweep driver).  Dispatch is pipelined and
        drained at ``sync_every_batches`` granularity."""
        sigma = jnp.float32(self.channel.sigma[s])
        pending = []

        # words are counted in drain(), alongside the error counts, so the
        # persisted counters stay consistent if a device fault interrupts the
        # dispatch loop (ADVICE r3: dispatch-time counting biased FER low on
        # resume after a partial failure)
        def drain():
            for c, n_words in pending:
                self.words[s] += n_words
                self.bit_errors[s] += np.asarray(c.bit_errors, np.float64)
                self.frame_errors[s] += np.asarray(c.frame_errors, np.float64)
            pending.clear()

        for _ in range(batches):
            self.key, sub = split_async(self.key)
            pending.append((self._step(sub, sigma), self.cfg.batch_size))
            if len(pending) >= max(self.cfg.sync_every_batches, 1):
                drain()
        drain()

    def run(self, verbose: bool = True):
        cfg = self.cfg
        ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
        for s, sigma in enumerate(self.channel.sigma):
            batches_done = 0
            pending = []

            def drain(s=s, pending=pending):
                for c, n_words in pending:
                    self.words[s] += n_words
                    self.bit_errors[s] += np.asarray(c.bit_errors, np.float64)
                    self.frame_errors[s] += np.asarray(c.frame_errors, np.float64)
                pending.clear()

            # dispatched-but-undrained words count toward the budget check so
            # the sweep stops at the same point it did when words were counted
            # at dispatch time
            while self.words[s] + len(pending) * cfg.batch_size < cfg.max_words_per_snr:
                if cfg.min_frame_errors and self.frame_errors[s, -1] >= cfg.min_frame_errors:
                    break
                self.key, sub = split_async(self.key)
                pending.append((self._step(sub, jnp.float32(sigma)), cfg.batch_size))
                batches_done += 1
                if len(pending) >= max(cfg.sync_every_batches, 1):
                    drain()
                if ckpt and batches_done % cfg.checkpoint_every_batches == 0:
                    drain()
                    self.save_state(ckpt)
            drain()
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
        self._step = self._build_step()  # rebake params (fused path captures them)
