"""Cross-lift training walkthrough: train a neural decoder at a SMALL lift,
serve it at the FULL BG1-scale lift.

Neural min-sum weights are basegraph-level quantities (one scalar per
iteration under ITER sharing, one per CN-degree class per iteration under
DEGREE_ITER — models/sharing.py), so the param pytree is identical at every
lift Z of the same protograph.  Train where training is cheap, deploy where
the words are long.  Measured at scale in benchmarks/bg1_train_r5.json:
Z=256-trained weights at the 26,112-bit Z=384 lift cut FER 143x at 2.25 dB
and never lose to plain MS (high-SNR training mix).

The reference cannot express this workflow: its ConnectingMatrix
(/root/reference/src/boosted_neural_ldpc_decoder/ConnectingMatrix.py:82-99)
bakes one Z into dense (EZ)^2 routing matrices and registers parameters
against that single graph.

Run: python examples/bg1_crosslift.py   (CPU ~2 min; TPU uses fused kernels)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS=cpu even though the environment's sitecustomize
# imports jax before env vars can take effect (tests/conftest.py does the
# same repin)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from neural_ldpc_tpu.channel import AWGNChannel, ChannelConfig
from neural_ldpc_tpu.codes import TannerGraph
from neural_ldpc_tpu.codes.protograph import nr_bg1_like
from neural_ldpc_tpu.models import BoostedDecoderConfig, BoostedNeuralDecoder
from neural_ldpc_tpu.structs import DecoderType, NodeWeightSharingConfig
from neural_ldpc_tpu.training import TrainConfig, Trainer
from neural_ldpc_tpu.training.lr_schedule import LearningRate

ON_TPU = jax.devices()[0].platform != "cpu"
TRAIN_Z = 32 if not ON_TPU else 256   # small lift: cheap training
SERVE_Z = 96 if not ON_TPU else 384   # full lift: long words


def build(Z):
    code = nr_bg1_like(Z)  # same 46x68 BG1-structured protograph at any Z
    graph = TannerGraph.from_basegraph(code.basegraph, Z)
    dec = BoostedNeuralDecoder(graph, BoostedDecoderConfig(
        n_iterations=10, decoder_type=DecoderType.MS,
        sharing=NodeWeightSharingConfig(cn=3, ucn=0, vn=0)))
    return code, dec


# --- train at the small lift (high-SNR mix; see scripts/bg1_train_r5.py) ---
code_s, dec_s = build(TRAIN_Z)
print(f"train lift: Z={TRAIN_Z} ({code_s.n_bits}-bit words)")
chan = AWGNChannel(code_s, ChannelConfig(snr_db=(3.0, 3.5)))
params, _, _ = Trainer(dec_s, chan, TrainConfig(
    total_epochs=4, batch_size=64, train_words_per_epoch=640,
    validate_words=256, engine="fused" if ON_TPU else "xla",
    is_y_all_zero=True, learning_rate=LearningRate(2e-3, 0.0, 0),
    validate_epoch_step=10**9, checkpoint_step=10**9,
    checkpoint_dir="/tmp/bg1_crosslift_ckpt", export_weights_txt=False,
    verbose=False)).train()
print("learned per-iteration CN weights:",
      np.asarray(params["weight_cn"]).ravel().round(3))

# --- serve at the big lift: the SAME params pytree applies verbatim --------
code_b, dec_b = build(SERVE_Z)
print(f"serve lift: Z={SERVE_Z} ({code_b.n_bits}-bit words)")
# 2.25 dB = the waterfall cliff, where the trained gain is ~143x
chan_b = AWGNChannel(code_b, ChannelConfig(snr_db=(2.25,)))
llr, bits = chan_b.sample_at(jax.random.PRNGKey(1), 128, 0)

base_fer = trained_fer = 0.0
for tag, p in (("plain MS", dec_b.init_params()), ("trained", params)):
    app = np.asarray(dec_b.apply(p, llr)[-1])
    fer = ((app < 0).any(axis=1)).mean()  # all-zero words, STANDARD convention
    print(f"  {tag:>8}: FER {fer:.4f} on this batch")

print("done — full paired waterfalls: scripts/bg1_train_r5.py / "
      "benchmarks/bg1_train_r5.json")
