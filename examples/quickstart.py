"""Quickstart: load a code, decode, train, evaluate.

Run: python examples/quickstart.py   (CPU or TPU; TPU auto-uses the fused kernel)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph, get_code
from neural_ldpc_tpu.eval.montecarlo import CampaignConfig, MonteCarloCampaign
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training import TrainConfig, Trainer

# ---------------------------------------------------------------------------
# 1. A code and its Tanner graph (wman = IEEE 802.16 N=576 R=3/4;
#    "nr_bg2_set0_z16" = 5G BG2 with a generator matrix for random codewords)
# ---------------------------------------------------------------------------
code = get_code("wman_n576_r34_z24")
# wman ships no generator matrix; derive one from H over GF(2) so random
# codewords work (the reference is stuck with all-zero words for this code)
code = code.with_derived_generator()
graph = TannerGraph.from_basegraph(code.basegraph, code.Z)
print(f"{code.name}: N*Z={code.n_bits} bits, {code.n_checks} checks, "
      f"{graph.E} proto edges, rate {code.code_rate():.3f}")

# ---------------------------------------------------------------------------
# 2. A decoder: min-sum with one trainable CN scalar per iteration
#    (decoder_type=SP/MS/QMS; sharing modes 0-6 per node type; UCN optional)
# ---------------------------------------------------------------------------
decoder = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
    n_iterations=10,
    decoder_type=DecoderType.MS,
    sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0),
))
params = decoder.init_params()

# ---------------------------------------------------------------------------
# 3. Decode a batch from the AWGN channel
# ---------------------------------------------------------------------------
channel = AWGNChannel(code, ChannelConfig(snr_db=(4.0,)))
llr, bits = channel.sample_at(jax.random.PRNGKey(0), 256, snr_index=0)
app = decoder.apply(params, llr)          # [iterations, batch, N*Z]
hard = (app[-1] < 0).astype(jnp.int32)    # bit = 1 iff final LLR < 0
print("BER @4dB, 10 plain-MS iterations:",
      float((hard != bits.astype(jnp.int32)).mean()))

# ---------------------------------------------------------------------------
# 4. Train the weights (jitted step: Adam + grad clip + weight projection)
# ---------------------------------------------------------------------------
trainer = Trainer(decoder, AWGNChannel(code, ChannelConfig(snr_db=(2.0, 3.0, 4.0))),
                  TrainConfig(total_epochs=3, batch_size=128,
                              train_words_per_epoch=1024, validate_words=256,
                              validate_epoch_step=3, checkpoint_step=10**9,
                              log_metrics_step=10**9, progress_step=10**9,
                              checkpoint_dir="/tmp/quickstart_ckpt",
                              export_weights_txt=False, verbose=False))
params, _, info = trainer.train()
print("trained 3 epochs:", {k: float(v) for k, v in info.items()})

# ---------------------------------------------------------------------------
# 5. Monte-Carlo BER/FER campaign (fused Pallas kernel on TPU, XLA elsewhere)
# ---------------------------------------------------------------------------
mc = MonteCarloCampaign(
    decoder, params, AWGNChannel(code, ChannelConfig(snr_db=(3.0, 4.0))),
    CampaignConfig(batch_size=4096, max_words_per_snr=65536, min_frame_errors=50),
)
for snr, r in mc.run(verbose=False).items():
    print(f"SNR {snr} dB: {r['words']} words, BER {r['ber'][-1]:.3e}, "
          f"FER {r['fer'][-1]:.3e}")

# ---------------------------------------------------------------------------
# 6. Export weights for hardware (per-parameter .txt + index manifest)
# ---------------------------------------------------------------------------
from neural_ldpc_tpu.utils import CheckpointManager

cm = CheckpointManager("/tmp/quickstart_ckpt")
path = cm.save_weights("final", decoder.named_parameter_rows(params), as_txt=True)
print("weights exported to", path)
