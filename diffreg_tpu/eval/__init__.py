from .metrics import (
    blend_anchor_motion,
    fmr_from_irs,
    inlier_ratio,
    matrix_to_quaternion,
    nfmr,
    registration_recall_success,
    transformation_error_covariance,
)
from .ransac import RansacResult, ransac_pose

__all__ = [
    "inlier_ratio",
    "fmr_from_irs",
    "nfmr",
    "blend_anchor_motion",
    "registration_recall_success",
    "transformation_error_covariance",
    "matrix_to_quaternion",
    "ransac_pose",
    "RansacResult",
]
