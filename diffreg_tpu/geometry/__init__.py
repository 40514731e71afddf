from .se3 import apply_transform, compose, inverse, rotation_error_deg, translation_error
from .procrustes import ProcrustesResult, soft_procrustes, weighted_kabsch

__all__ = [
    "apply_transform",
    "compose",
    "inverse",
    "rotation_error_deg",
    "translation_error",
    "ProcrustesResult",
    "soft_procrustes",
    "weighted_kabsch",
]
