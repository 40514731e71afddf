"""Package import-surface guard: every public subpackage imports cleanly
and the vision3d-equivalent symbol families stay exported (a rename or a
broken import in any __init__ fails here before anything subtle does)."""
import ast
import os

import diffreg_tpu
from diffreg_tpu import engine, eval as _eval, geometry, ops, zoo

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ops_surface():
    for name in ["log_sinkhorn", "volumetric_pe", "grid_subsample",
                 "radius_neighbors", "knn", "kpconv", "spatial_consistency",
                 "leading_eigenvector", "local_ppf", "global_ppf",
                 "build_local_reference_frame", "estimate_normals",
                 "sample_pdf", "volume_render", "batch_to_pack",
                 "pack_to_batch", "mutual_topk_mask",
                 "extract_correspondences"]:
        assert hasattr(ops, name), name


def test_geometry_surface():
    for name in ["apply_transform", "weighted_kabsch", "soft_procrustes",
                 "apply_embedded_deformation", "non_rigid_icp_adam",
                 "non_rigid_icp_gauss_newton", "rodrigues_rotation_formula",
                 "alignment_rotation_matrix", "quaternion_product",
                 "axis_angle_to_rotation_matrix"]:
        assert hasattr(geometry, name), name


def test_zoo_surface():
    for name in ["GeometricTransformer", "local_global_registration",
                 "superpoint_matching_mutual_topk",
                 "superpoint_matching_global_topk",
                 "adaptive_superpoint_matching", "cofinet_node_matching",
                 "compute_detection_scores", "d3feat_loss", "predator_loss",
                 "PredatorGCN", "urr_extract_correspondences",
                 "randomized_weighted_procrustes", "differentiable_render",
                 "TNet", "SetAbstractionModule", "PointTransformerBlock",
                 "FoldingNet", "ResUNet", "KPConvFPN", "VNLinear",
                 "VNStdFeature", "XConv", "EdgeConv", "FeaturePropagate",
                 "SAConv", "GSAConv", "PNConv", "BasicConvResBlock",
                 "VanillaSiameseTransformer"]:
        assert hasattr(zoo, name), name


def test_engine_surface():
    for name in ["Trainer", "IterBasedTrainer", "BatchTester",
                 "CheckpointManager", "warmup_annealing_schedule",
                 "chamfer_distance_loss", "sigmoid_focal_loss",
                 "hardest_contrastive_loss", "as_rigid_as_possible_loss",
                 "transformation_loss"]:
        assert hasattr(engine, name), name


def test_driver_tools_parse():
    for f in ["bench.py", "__graft_entry__.py", "tools/capture_trace.py",
              "tools/train_synthetic.py", "tools/convert_checkpoint.py"]:
        ast.parse(open(os.path.join(ROOT, f)).read())
