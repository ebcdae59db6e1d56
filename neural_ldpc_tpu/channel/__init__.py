from .awgn import AWGNChannel, ChannelConfig
from .reference_datagen import ReferenceAWGNDatagen, ReferenceNeuralDatagen
