from .batch import PairBatch, ShapeSpec, pad_to
from .pyramid import PyramidConfig, batch_from_samples, build_pair_pyramid
from .synthetic import make_pair, synthetic_batch, tiny_spec

__all__ = [
    "PairBatch",
    "ShapeSpec",
    "pad_to",
    "PyramidConfig",
    "build_pair_pyramid",
    "batch_from_samples",
    "make_pair",
    "synthetic_batch",
    "tiny_spec",
]
