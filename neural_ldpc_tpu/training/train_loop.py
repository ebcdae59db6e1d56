"""Jit-compiled training step + full training driver.

TPU-native rework of train/train_BoostedNeuralLDPCDecoder.py: the reference's
per-batch Python loop (forward, BCE over all iterations, backward, grad-norm
clip 1.0, Adam, weight clamp to [0, 2] — train/…:260-296) compiles to a single
jitted step; the epoch driver keeps the reference's structure — validation
every N epochs with a per-iteration BER table, early stopping on validation
loss (patience/min_delta, :167-170,:402-415), checkpoint + metrics cadence
(:433-457), TTY progress bar with ETA (:21-69).

Data comes from the on-device AWGNChannel by default (per-batch fresh keys);
a host generator (e.g. ReferenceAWGNDatagen for bit-identical replay, or the
C++ native generator) can be plugged via ``host_datagen``.

Multi-chip: pass a ``jax.sharding.Mesh``; the batch is sharded over the
'data' axis and params replicated — XLA inserts the gradient psum.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from math import floor
from sys import stdout
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..channel.awgn import AWGNChannel
from ..eval.metrics import count_errors
from ..models.boosted_decoder import BoostedNeuralDecoder
from ..structs import LossType
from ..utils.checkpoint import CheckpointManager
from ..utils.rng import split_async
from ..utils.metrics_logger import MetricsLogger
from .loss import multi_iteration_loss
from .lr_schedule import LearningRate


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters (reference constant block, train/…:123-177)."""

    total_epochs: int = 500
    batch_size: int = 20
    train_words_per_epoch: int = 10000
    validate_words: int = 1000
    loss_type: LossType = LossType.BCE
    etha: float = 1.0
    learning_rate: LearningRate = dataclasses.field(
        default_factory=lambda: LearningRate(1e-3, 0.0, 0)
    )
    grad_clip_norm: float = 1.0
    is_y_all_zero: bool = False
    training_iter_start: int = 0
    training_iter_end: Optional[int] = None  # default: all iterations
    # restrict optimization to these param leaves (e.g. ("weight_ucn",));
    # None = train everything the row masks allow
    train_only_params: Optional[tuple[str, ...]] = None
    # gradient engine: "xla" differentiates the flat scan (ops/flat.py);
    # "fused" rides the Pallas forward/backward kernels (ops/pallas/
    # fused_train.py, MS/QMS only) — 1-2 orders of magnitude faster on TPU
    engine: str = "xla"
    patience: int = 10
    min_delta: float = 1e-5
    validate_epoch_step: int = 5
    checkpoint_step: int = 5
    log_metrics_step: int = 5
    progress_step: int = 5
    checkpoint_dir: str = "checkpoints"
    seed: int = 2042
    export_weights_txt: bool = True
    verbose: bool = True


def make_train_step(
    decoder: BoostedNeuralDecoder,
    train_cfg: TrainConfig,
    mesh=None,
):
    """Build (init_opt_state, step_fn).  step_fn(params, opt_state, llr, bits,
    lr) -> (params, opt_state, loss) — fully jitted, including the Adam
    update, gradient clipping, row freezing, and the clamp projection."""
    adam = optax.scale_by_adam()
    masks = decoder.trainable_row_masks()
    if train_cfg.train_only_params is not None:
        keep = set(train_cfg.train_only_params)
        masks = {k: (m if k in keep else m * 0.0) for k, m in masks.items()}
    i0 = train_cfg.training_iter_start
    i1 = (train_cfg.training_iter_end if train_cfg.training_iter_end is not None
          else decoder.config.n_iterations)
    coeffs = list(range(i1 - i0))  # reference: coeff_param=list(range(len(outputs)))
    convention = decoder.config.convention

    if train_cfg.engine == "fused":
        from ..ops.pallas.fused_train import FusedTrainDecoder

        ft = FusedTrainDecoder.from_decoder(decoder)

        def loss_fn(params, llr, bits):
            cn_w, ucn_w, vn_w = decoder._expanded_weights(params)
            outputs = ft.apply(cn_w, ucn_w, vn_w, llr)[i0:i1]
            return multi_iteration_loss(
                outputs, bits, train_cfg.loss_type, train_cfg.etha, coeffs, convention
            )
    elif train_cfg.engine == "xla":
        def loss_fn(params, llr, bits):
            outputs = decoder.apply(params, llr)[i0:i1]
            return multi_iteration_loss(
                outputs, bits, train_cfg.loss_type, train_cfg.etha, coeffs, convention
            )
    else:
        raise ValueError(f"unknown training engine {train_cfg.engine!r}")

    def _apply_grads(params, opt_state, loss, grads, lr):
        # global-norm clip over ALL grads, frozen rows included (the reference
        # clips model.parameters() before the optimizer sees them, train/…:292)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, train_cfg.grad_clip_norm / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        grads = {k: (g * masks[k] if k in masks else g) for k, g in grads.items()}
        updates, opt_state = adam.update(grads, opt_state, params)
        params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))
        params = decoder.clamp_params(params)
        return params, opt_state, loss

    def step(params, opt_state, llr, bits, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, llr, bits)
        return _apply_grads(params, opt_state, loss, grads, lr)

    if mesh is not None:
        if train_cfg.engine == "fused":
            # a pallas_call cannot be auto-partitioned by jit's sharding pass;
            # run the whole step per-shard under shard_map with explicit
            # gradient/loss pmean over the data axis (same math as the jitted
            # psum the XLA path gets implicitly)
            from jax.experimental.shard_map import shard_map

            def sharded_step(params, opt_state, llr, bits, lr):
                loss, grads = jax.value_and_grad(loss_fn)(params, llr, bits)
                loss = jax.lax.pmean(loss, "data")
                grads = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), grads)
                return _apply_grads(params, opt_state, loss, grads, lr)

            step = jax.jit(
                shard_map(
                    sharded_step,
                    mesh=mesh,
                    in_specs=(P(), P(), P("data"), P("data"), P()),
                    out_specs=(P(), P(), P()),
                    check_rep=False,
                )
            )
        else:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            step = jax.jit(
                step,
                in_shardings=(repl, repl, data, data, None),
                out_shardings=(repl, repl, None),
            )
    else:
        step = jax.jit(step)

    def init_opt_state(params):
        return adam.init(params)

    return init_opt_state, step


def make_eval_step(decoder: BoostedNeuralDecoder, train_cfg: TrainConfig, mesh=None):
    convention = decoder.config.convention

    def step(params, llr, bits):
        outputs = decoder.apply(params, llr)
        loss = multi_iteration_loss(
            outputs, bits, train_cfg.loss_type, train_cfg.etha,
            list(range(outputs.shape[0])), convention,
        )
        counts = count_errors(bits, outputs, convention)
        return loss, counts

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data, data))
    return jax.jit(step)


def format_eta(seconds: float) -> str:
    """Largest-two-units ETA rendering ("2h 5m" / "5m 12s" / "47s")."""
    h, rem = divmod(int(seconds), 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h {m}m"
    if m:
        return f"{m}m {s}s"
    return f"{s}s"


def format_train_progress(
    current_batch, total_batches, current_epoch, total_epochs,
    loss=None, start_time=None, bar_length=40, now=None,
) -> str:
    """One progress line (pure; the reference renders the same fields inline,
    train/train_BoostedNeuralLDPCDecoder.py:21-69).  The bar fills by EPOCH
    fraction while the counter shows batches — the reference's convention."""
    now = now if now is not None else datetime.now()
    filled = int(bar_length * current_epoch / max(total_epochs, 1))
    parts = [
        f"[{now.strftime('%H:%M:%S')}]",
        f"Epoch {current_epoch}/{total_epochs}",
        f"[{'#' * filled}{' ' * (bar_length - filled)}]",
        f"{current_batch}/{total_batches}",
    ]
    if loss is not None:
        parts.append(f"Loss: {loss:.6f}")
    done = (current_epoch - 1) * total_batches + current_batch
    if start_time is not None and current_batch > 0 and done > 0:
        elapsed = now.timestamp() - start_time
        remaining = total_epochs * total_batches - done
        parts.append(f"ETA: {format_eta(remaining * elapsed / done)}")
    return " ".join(parts)


def print_train_progress(
    current_batch, total_batches, current_epoch, total_epochs,
    loss=None, start_time=None, bar_length=40,
):
    """In-place TTY progress bar with ETA; newline on the epoch's last batch."""
    stdout.write("\r" + format_train_progress(
        current_batch, total_batches, current_epoch, total_epochs,
        loss, start_time, bar_length,
    ))
    stdout.flush()
    if current_batch == total_batches:
        stdout.write("\n")


class Trainer:
    """Epoch driver with validation, early stopping, checkpointing and
    metrics logging — the train/train_BoostedNeuralLDPCDecoder.py program as a
    reusable class."""

    def __init__(
        self,
        decoder: BoostedNeuralDecoder,
        channel: AWGNChannel,
        train_cfg: TrainConfig = TrainConfig(),
        mesh=None,
        host_datagen: Optional[Callable] = None,
    ):
        self.decoder = decoder
        self.channel = channel
        self.cfg = train_cfg
        self.mesh = mesh
        self.host_datagen = host_datagen
        self.init_opt_state, self.train_step = make_train_step(decoder, train_cfg, mesh)
        self.eval_step = make_eval_step(decoder, train_cfg, mesh)
        self.checkpoints = CheckpointManager(train_cfg.checkpoint_dir)
        self.logger = MetricsLogger(train_cfg.checkpoint_dir)

    def _batch(self, key):
        if self.host_datagen is not None:
            x, y = self.host_datagen(self.cfg.batch_size)
            llr, bits = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
        else:
            llr, bits = self.channel.sample_mixed(
                key, self.cfg.batch_size, all_zero=self.cfg.is_y_all_zero
            )
        if self.mesh is not None:
            data = NamedSharding(self.mesh, P("data"))
            llr, bits = jax.device_put(llr, data), jax.device_put(bits, data)
        return llr, bits

    def resume(self, checkpoint_name: str):
        """Restore params / optimizer state / epoch / RNG from a checkpoint
        written by ``train`` and continue training.  The continuation is
        bitwise-identical to an uninterrupted run (the RNG key is saved at the
        epoch boundary and the LR schedule is fast-forwarded)."""
        params_t = self.decoder.init_params()
        opt_t = self.init_opt_state(params_t)
        params, opt_state, meta, rng_key, extras = self.checkpoints.load(
            checkpoint_name, params_t, opt_t
        )
        if rng_key is None:
            raise ValueError(f"checkpoint {checkpoint_name!r} has no rng_key")
        start_epoch = int(meta.get("epoch", 0)) + 1
        params = jax.tree.map(jnp.asarray, params)
        opt_state = jax.tree.map(jnp.asarray, opt_state)
        return self.train(
            params=params, opt_state=opt_state, start_epoch=start_epoch,
            rng_key=rng_key,
            best_loss=float(extras.get("best_loss", np.inf)),
            patience_counter=int(extras.get("patience_counter", 0)),
        )

    def train(self, params=None, opt_state=None, start_epoch: int = 0,
              rng_key=None, best_loss: float = float("inf"),
              patience_counter: int = 0):
        cfg = self.cfg
        params = params if params is not None else self.decoder.init_params()
        if self.mesh is not None:
            params = jax.device_put(params, NamedSharding(self.mesh, P()))
        opt_state = opt_state if opt_state is not None else self.init_opt_state(params)
        key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed)
        # fresh clone per train() call: the config's instance is shared, and
        # advancing it in place would double-advance on train-then-resume
        lr_sched = cfg.learning_rate.clone()
        lr_sched.step = max(0, start_epoch - 1)
        batches_per_epoch = floor(cfg.train_words_per_epoch / cfg.batch_size)
        valid_batches = floor(cfg.validate_words / cfg.batch_size)

        avg_valid_loss = last_iter_ber = last_iter_fer = 0.0
        avg_epoch_loss, current_lr = 0.0, lr_sched.lr
        t0 = datetime.now().timestamp()

        for epoch in range(start_epoch, cfg.total_epochs + 1):
            if epoch > 0:
                current_lr = lr_sched()
                # keep per-batch losses on device: a float() per step forces a
                # full host<->device round-trip and serializes dispatch (the
                # dominant cost at small batch); sync only on progress prints
                epoch_losses, loss_val = [], 0.0
                for b in range(batches_per_epoch):
                    key, sub = split_async(key)
                    llr, bits = self._batch(sub)
                    params, opt_state, loss = self.train_step(
                        params, opt_state, llr, bits, jnp.float32(current_lr)
                    )
                    epoch_losses.append(loss)
                    if cfg.verbose and b % cfg.progress_step == 0:
                        loss_val = float(loss)
                        print_train_progress(b + 1, batches_per_epoch, epoch,
                                             cfg.total_epochs, loss_val, t0)
                loss_val = float(epoch_losses[-1])
                avg_epoch_loss = float(jnp.mean(jnp.stack(epoch_losses)))
                if cfg.verbose:
                    print_train_progress(batches_per_epoch, batches_per_epoch, epoch,
                                         cfg.total_epochs, loss_val, t0)
                    print(f"\nEpoch {epoch}/{cfg.total_epochs} avg loss {avg_epoch_loss:.6f}")

            stop = False
            if epoch % cfg.validate_epoch_step == 0:
                valid_loss = 0.0
                tot = dict(be=0.0, bits=0.0, fe=0.0, frames=0.0,
                           last_be=0.0, last_bits=0.0, last_fe=0.0, last_frames=0.0)
                for b in range(valid_batches):
                    key, sub = split_async(key)
                    llr, bits = self._batch(sub)
                    loss, counts = self.eval_step(params, llr, bits)
                    valid_loss += float(loss)
                    be = np.asarray(counts.bit_errors)
                    fe = np.asarray(counts.frame_errors)
                    nbits, nframes = float(counts.total_bits), float(counts.total_frames)
                    if b == 0 and cfg.verbose:
                        bers, fers = be / nbits, fe / nframes
                        best = int(np.argmin(bers))
                        print(">>> Per-Iteration Performance (First Validation Batch):")
                        for i, (bb, ff) in enumerate(zip(bers, fers)):
                            mark = " <- BEST BER" if i == best else ""
                            print(f"    Iter {i:2d}: BER={bb:.6e}, FER={ff:.4f}{mark}")
                    tot["be"] += be.sum(); tot["bits"] += nbits * len(be)
                    tot["fe"] += fe.sum(); tot["frames"] += nframes * len(fe)
                    tot["last_be"] += be[-1]; tot["last_bits"] += nbits
                    tot["last_fe"] += fe[-1]; tot["last_frames"] += nframes
                avg_valid_loss = valid_loss / max(valid_batches, 1)
                last_iter_ber = tot["last_be"] / max(tot["last_bits"], 1)
                last_iter_fer = tot["last_fe"] / max(tot["last_frames"], 1)
                if cfg.verbose:
                    print(f">>> Validation (epoch {epoch}): loss {avg_valid_loss:.6f}, "
                          f"BER(all) {tot['be']/max(tot['bits'],1):.6e}, "
                          f"BER(last) {last_iter_ber:.6e}, FER(last) {last_iter_fer:.6f}")
                if avg_valid_loss < best_loss - cfg.min_delta:
                    best_loss, patience_counter = avg_valid_loss, 0
                else:
                    patience_counter += 1
                    if patience_counter >= cfg.patience:
                        if cfg.verbose:
                            print(f"Early stopping at epoch {epoch}; best loss {best_loss:.6f}")
                        stop = True

            metrics = {
                "loss": avg_valid_loss if epoch % cfg.validate_epoch_step == 0 else avg_epoch_loss,
                "ber_last_iter": last_iter_ber,
                "fer_last_iter": last_iter_fer,
            }
            ckpt_cfg = {"batch_size": cfg.batch_size, "lr": current_lr}
            ckpt_name = "NA"
            if epoch % cfg.checkpoint_step == 0:
                ckpt_name = f"checkpoint_epoch_{epoch:04d}"
                self.checkpoints.save(ckpt_name, params, opt_state, epoch=epoch,
                                      metrics=metrics, config=ckpt_cfg, rng_key=key,
                                      extra_arrays={
                                          "best_loss": np.float64(best_loss),
                                          "patience_counter": np.int64(patience_counter),
                                      })
                self.checkpoints.save_weights(
                    f"weights_epoch_{epoch:04d}",
                    self.decoder.named_parameter_rows(params),
                    as_txt=cfg.export_weights_txt,
                )
            if epoch % cfg.log_metrics_step == 0:
                self.logger.log(epoch, metrics, ckpt_name, config=ckpt_cfg)
            if stop:
                break

        return params, opt_state, {"best_loss": best_loss, "ber_last_iter": last_iter_ber}
