"""On-device AWGN channel + codeword generation.

TPU-native replacement for the reference's host-side numpy generator
(src/boosted_neural_ldpc_decoder/AWGNPassedDatagen.py): codewords, BPSK
modulation, noise, LLR computation, QMS pre-quantization, and
puncturing/shortening all run inside jit on device, driven by counter-based
``jax.random`` keys (restartable, host-count invariant).  A host numpy
generator with the reference's exact RandomState semantics lives in
``reference_datagen.py`` for differential tests.

Conventions (structs.Convention):
  STANDARD: BPSK bit0 -> +1 (shortened bits pinned to +clip).
  REFERENCE: BPSK bit0 -> -1, matching the reference's inverted mapping
    (AWGNPassedDatagen.py:97-101; shortened bits pinned to -clip, :117-118).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.protograph import CodeSpec
from ..ops.quantize import qms_quantize_value
from ..structs import Clipping, Convention, Puncture, Shortening


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    snr_db: tuple[float, ...] = (2.0, 2.5, 3.0, 3.5, 4.0)
    puncture: Puncture = Puncture(0, 0)
    shortening: Shortening = Shortening(0, 0)
    allowed_llr_range: Clipping = Clipping(start=-20.0, end=20.0)
    convention: Convention = Convention.STANDARD
    qms_qbit: Optional[int] = None  # pre-quantize channel LLRs when set
    sp_puncture_value: float = 0.0  # reference uses 0.001 for SP (:111-114)
    rate_override: Optional[float] = None


class AWGNChannel:
    """Callable generator: ``channel.sample(key, n_words)`` -> (llr, bits).

    Code rate follows the reference: K / (N - |puncture_cols| - |short_cols|)
    in base-graph columns (AWGNPassedDatagen.py:47) — note the reference
    counts punctured/shortened BITS against base-graph COLUMNS; we keep that
    formula for parity (rate_override allows a corrected value).
    """

    def __init__(self, code: CodeSpec, config: ChannelConfig = ChannelConfig()):
        self.code = code
        self.config = config
        if config.rate_override is not None:
            self.rate = config.rate_override
        elif config.convention == Convention.REFERENCE:
            # Reference rate quirk (AWGNPassedDatagen.py:47): K/(N - len(p) -
            # len(s)) with N in base-graph columns, and the degenerate
            # Puncture(0,0)/Shortening(0,0) ranges each counting len 1 — so
            # the reference's default SNR->sigma mapping uses rate K/(N-2).
            self.rate = float(code.K) / float(
                code.N - len(config.puncture) - len(config.shortening)
            )
        else:
            n_p = len(config.puncture) if config.puncture.start > 0 else 0
            n_s = len(config.shortening) if config.shortening.start > 0 else 0
            self.rate = code.code_rate(n_p, n_s)
        snr = np.asarray(config.snr_db, dtype=np.float64)
        self.sigma = np.sqrt(1.0 / (2.0 * (10.0 ** (snr / 10.0)) * self.rate)).astype(np.float32)
        # Kept uint8 on device and passed to the jitted sampler as a traced
        # ARGUMENT, never closed over: a jit-captured device constant is
        # fetched device->host at every trace, and at BG1 scale the dense
        # generator is 220 MB (Z=384: [8448, 26112]) — as an embedded
        # constant it would blow the remote-compile request limit outright.
        # The f32 cast for the MXU encode happens inside the jit (sums are
        # <= K*Z = 8448 << 2^24, so f32 accumulation is exact).
        self._gen_matrix = (
            jnp.asarray(code.gen_matrix, jnp.uint8) if code.gen_matrix is not None else None
        )

        nz = code.n_bits
        clip_abs = config.allowed_llr_range.abs
        # channel post-processing masks over the flat bit index (1-based
        # inclusive ranges, reference :110-118)
        mask = np.zeros(nz, dtype=np.float32)
        fill = np.zeros(nz, dtype=np.float32)
        if config.puncture.start > 0:
            mask[config.puncture.start - 1 : config.puncture.end] = 1.0
            fill[config.puncture.start - 1 : config.puncture.end] = config.sp_puncture_value
        if config.shortening.start > 0:
            pinned = -clip_abs if config.convention == Convention.REFERENCE else clip_abs
            mask[config.shortening.start - 1 : config.shortening.end] = 1.0
            fill[config.shortening.start - 1 : config.shortening.end] = pinned
        self._mask = jnp.asarray(mask)
        self._fill = jnp.asarray(fill)

    # ------------------------------------------------------------------
    def encode(self, info_bits: jnp.ndarray) -> jnp.ndarray:
        """info_bits [B, K*Z] -> codeword bits [B, N*Z] via the systematic
        generator matrix (reference _gen_y, :195-203)."""
        if self._gen_matrix is None:
            raise ValueError("code has no generator matrix; use all-zero codewords")
        return _gf2_encode(info_bits, self._gen_matrix)

    def random_codewords(self, key: jax.Array, n_words: int) -> jnp.ndarray:
        info = jax.random.bernoulli(key, 0.5, (n_words, self.code.n_info_bits))
        return self.encode(info.astype(jnp.float32))

    def sample_randcw_at_sigma(self, key: jax.Array, n_words: int, sigma: float):
        """Random-codeword batch at one sigma with the generator as a traced
        jit argument (BG1-scale generators cannot ride the constant-embedding
        ``sample`` path — see the ``_gen_matrix`` note in ``__init__``)."""
        if self._gen_matrix is None:
            raise ValueError("code has no generator matrix")
        return _sample_randcw(
            key, self._gen_matrix, self._mask, self._fill,
            jnp.full((n_words,), jnp.float32(sigma)), n_words,
            self.code.n_info_bits, self.code.N, self.code.Z,
            self.config.convention == Convention.REFERENCE, self.config.qms_qbit,
        )

    def modulate(self, bits: jnp.ndarray) -> jnp.ndarray:
        if self.config.convention == Convention.REFERENCE:
            return 2.0 * bits - 1.0  # bit0 -> -1 (reference :97-101)
        return 1.0 - 2.0 * bits  # bit0 -> +1

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 2, 4))
    def sample(
        self,
        key: jax.Array,
        n_words: int,
        sigma_per_word: jnp.ndarray,
        all_zero: bool = True,
    ):
        """Generate one batch: returns (llr [B, N, Z], bits [B, N*Z] float32).

        ``sigma_per_word``: [B] noise std per word (see sample_mixed / sample_at).
        """
        k_noise, k_word = jax.random.split(key)
        if all_zero:
            bits = jnp.zeros((n_words, self.code.n_bits), jnp.float32)
        else:
            bits = self.random_codewords(k_word, n_words)
        sym = self.modulate(bits)
        sigma = sigma_per_word[:, None].astype(jnp.float32)
        rx = sym + sigma * jax.random.normal(k_noise, sym.shape, jnp.float32)
        llr = 2.0 * rx / (sigma ** 2)
        if self.config.qms_qbit is not None:
            llr = qms_quantize_value(llr, self.config.qms_qbit)
        llr = llr * (1.0 - self._mask) + self._fill * self._mask
        return llr.reshape(n_words, self.code.N, self.code.Z), bits

    def sample_mixed(self, key: jax.Array, n_words: int, all_zero: bool = True):
        """Round-robin SNR assignment within the batch — word i gets
        snr_db[i % S] (reference _gendata_mixed, :136-193)."""
        idx = np.arange(n_words) % len(self.sigma)
        return self.sample(key, n_words, jnp.asarray(self.sigma[idx]), all_zero)

    def sample_at(self, key: jax.Array, n_words: int, snr_index: int, all_zero: bool = True):
        """All words at one SNR (sane fix of the reference's ``per_snr`` mode,
        which — verified — only ever uses its first SNR because the batch
        counter is never reset, AWGNPassedDatagen.py:90-125)."""
        sig = jnp.full((n_words,), self.sigma[snr_index])
        return self.sample(key, n_words, sig, all_zero)

    def sample_at_sigma(self, key: jax.Array, n_words: int, sigma: float, all_zero: bool = True):
        return self.sample(key, n_words, jnp.full((n_words,), jnp.float32(sigma)), all_zero)


def _gf2_encode(info_bits: jnp.ndarray, gen_u8: jnp.ndarray) -> jnp.ndarray:
    """[B, K*Z] f32 @ uint8 generator -> [B, N*Z] f32 bits (mod-2 of an exact
    f32 MXU matmul; row sums <= K*Z << 2^24)."""
    return jnp.mod(info_bits.astype(jnp.float32) @ gen_u8.astype(jnp.float32), 2.0)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def _sample_randcw(key, gen_u8, mask, fill, sigma_per_word, n_words, n_info,
                   N, Z, ref_conv, qbit):
    k_noise, k_word = jax.random.split(key)
    info = jax.random.bernoulli(k_word, 0.5, (n_words, n_info))
    bits = _gf2_encode(info.astype(jnp.float32), gen_u8)
    sym = (2.0 * bits - 1.0) if ref_conv else (1.0 - 2.0 * bits)
    sigma = sigma_per_word[:, None].astype(jnp.float32)
    rx = sym + sigma * jax.random.normal(k_noise, sym.shape, jnp.float32)
    llr = 2.0 * rx / (sigma ** 2)
    if qbit is not None:
        llr = qms_quantize_value(llr, qbit)
    llr = llr * (1.0 - mask) + fill * mask
    return llr.reshape(n_words, N, Z), bits
