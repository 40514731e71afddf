from .kpfcn import KPFCN, KPFCNConfig, UnaryBlock
from .matching import Matching, MatchingConfig
from .transformer import (
    GeometryAttentionLayer,
    ProcrustesConfig,
    RepositioningTransformer,
    TransformerConfig,
)

__all__ = [
    "KPFCN",
    "KPFCNConfig",
    "UnaryBlock",
    "Matching",
    "MatchingConfig",
    "GeometryAttentionLayer",
    "RepositioningTransformer",
    "TransformerConfig",
    "ProcrustesConfig",
]
