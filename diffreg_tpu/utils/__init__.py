from .precision import einsum, get_precision, matmul, set_precision

__all__ = ["einsum", "matmul", "set_precision", "get_precision"]
