"""Pallas TPU kernels — the native compute tier (fused BP decode)."""

from .minsum import FusedMinsumDecoder
