"""TPU-native neural LDPC decoder framework (JAX / XLA / Pallas).

A from-scratch re-design of ShapeLayer/neural-ldpc-decoder-torch for TPU:
trainable belief-propagation decoding of protograph/QC-LDPC codes
(Dai et al., arXiv:2102.03828) and boosted error-floor training
(Kwak et al., arXiv:2310.07194).
"""

from .structs import (
    Clipping,
    Convention,
    DecoderType,
    LossType,
    NodeType,
    NodeWeightSharingConfig,
    ParamType,
    Puncture,
    SharingMode,
    Shortening,
)

__version__ = "0.1.0"
