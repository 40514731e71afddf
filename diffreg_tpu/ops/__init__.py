"""Device-kernel layer: static-shape JAX/Pallas primitives.

Every C++/CUDA component of the reference (SURVEY.md §2) maps here; none of
them survive as host code except the numpy twins used by the data pipeline.
"""
from .masked import NEG_INF, mask_matrix, masked_instance_norm, masked_mean, masked_var
from .sinkhorn import dual_softmax_conf_matrix, log_sinkhorn, sinkhorn_conf_matrix
from .position_encoding import embed_pos, embed_rotary, volumetric_pe
from .select import (
    Correspondences,
    extract_correspondences,
    mutual_topk_correspondences,
    mutual_topk_mask,
    thresholded_mutual_argmax_mask,
)
from .subsample import grid_subsample, grid_subsample_np, grid_subsample_with_features_np
from .neighbors import knn, knn_np, radius_neighbors, radius_neighbors_np
from .kpconv import closest_pool, kpconv, max_pool
from .kernel_points import load_kernel_points, unit_kernel_points
from .consistency import (cross_spatial_consistency, leading_eigenvector,
                          spatial_consistency)
from .features import (build_local_reference_frame, deg2rad, estimate_normals,
                       global_ppf, local_ppf, rad2deg, safe_divide, safe_sqrt,
                       vector_angle)
from .render import sample_pdf, volume_render
from .conversion import batch_to_pack, pack_to_batch

__all__ = [
    "NEG_INF",
    "mask_matrix",
    "masked_instance_norm",
    "masked_mean",
    "masked_var",
    "log_sinkhorn",
    "sinkhorn_conf_matrix",
    "dual_softmax_conf_matrix",
    "volumetric_pe",
    "embed_rotary",
    "embed_pos",
    "Correspondences",
    "mutual_topk_mask",
    "mutual_topk_correspondences",
    "extract_correspondences",
    "thresholded_mutual_argmax_mask",
    "grid_subsample",
    "grid_subsample_np",
    "grid_subsample_with_features_np",
    "radius_neighbors",
    "radius_neighbors_np",
    "knn",
    "knn_np",
    "kpconv",
    "max_pool",
    "closest_pool",
    "load_kernel_points",
    "unit_kernel_points",
    "spatial_consistency",
    "cross_spatial_consistency",
    "leading_eigenvector",
    "vector_angle",
    "rad2deg",
    "deg2rad",
    "local_ppf",
    "global_ppf",
    "build_local_reference_frame",
    "estimate_normals",
    "safe_divide",
    "safe_sqrt",
    "sample_pdf",
    "volume_render",
    "batch_to_pack",
    "pack_to_batch",
]
