"""Task presets mirroring the reference config YAMLs.

References: Diff-Reg-3dmatch/configs/test/3dmatch.yaml, configs/models.py:3-24
(architecture list), Diff-Reg-4dmatch twin configs.
"""
from __future__ import annotations

import dataclasses

from ..nn.kpfcn import KPFCNConfig
from ..nn.matching import MatchingConfig
from ..nn.transformer import ProcrustesConfig, TransformerConfig
from .diffusion_matching import PipelineConfig

KPFCN_ARCHITECTURE = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
)


def preset_3dmatch(sample_steps: int = 20, feature_dim: int = 432,
                   first_feats_dim: int = 256, train: bool = False) -> PipelineConfig:
    """3DMatch/3DLoMatch rigid registration (configs/test/3dmatch.yaml).

    ``train=True`` enables the condition gate at 200 like the reference
    train config (Diff-Reg-3dmatch/configs/train/3dmatch.yaml:52) so the
    repositioning warp is active; the test config keeps 0 (identity warp,
    configs/test/3dmatch.yaml:51).
    """
    matching = MatchingConfig(
        feature_dim=feature_dim,
        match_type="sinkhorn",
        confidence_threshold=0.2,
        skh_init_bin_score=1.0,
        skh_iters=3,
    )
    procrustes = ProcrustesConfig(
        sample_rate=1.0,
        max_condition_num=200.0 if train else 0.0,
        # The reference derives the weight budget from the PADDED sizes
        # (procrustes.py:61-62), which at eval B=1 equal the REAL lengths.
        # Our bucket padding is an implementation detail and must not widen
        # the budget, so masked (real) lengths are the faithful choice.
        use_masked_lengths=True,
    )
    transformer = TransformerConfig(
        feature_dim=feature_dim,
        n_head=4,
        layer_types=("self", "cross", "positioning", "self", "cross"),
        positioning_type="procrustes",
        pe_type="rotary",
        vol_origin=(-3.6, -2.4, 1.14),
        voxel_size=0.08,
        entangled=False,
        procrustes=procrustes,
        feature_matching=matching,
        flash_attention=True,   # fused Pallas attention (XLA fallback on CPU tests)
    )
    kpfcn = KPFCNConfig(
        architecture=KPFCN_ARCHITECTURE,
        first_feats_dim=first_feats_dim,
        in_feats_dim=1,
        first_subsampling_dl=0.025,
        conv_radius=2.5,
        kp_extent=2.0,
        coarse_feature_dim=feature_dim,
        fine_feature_dim=264,
        coarse_level=-2,
    )
    return PipelineConfig(
        kpfcn=kpfcn,
        coarse_transformer=transformer,
        coarse_matching=matching,
        procrustes=procrustes,
        sample_steps=sample_steps,
        variant="3dmatch",
    )


def preset_4dmatch(sample_steps: int = 20, thr: float = 0.55) -> PipelineConfig:
    """4DMatch/4DLoMatch deformable registration (4dmatch twin deltas,
    SURVEY.md §2.1): gaussian+sigmoid noising, stochastic DDIM, masked-length
    procrustes, sigmoid prediction head with thr-based extraction.

    Dim/scale deltas vs 3DMatch (Diff-Reg-4dmatch/configs/test/4dmatch.yaml):
    coarse_feature_dim 528, first_subsampling_dl 0.01, VolPE voxel 0.04,
    max_condition_num=40 for BOTH train and test (yaml:53) — the
    repositioning warp is live in 4DMatch inference, unlike 3DMatch test."""
    base = preset_3dmatch(sample_steps=sample_steps, feature_dim=528)
    procrustes = dataclasses.replace(
        base.procrustes, use_masked_lengths=True, max_condition_num=40.0)
    transformer = dataclasses.replace(
        base.coarse_transformer, procrustes=procrustes, voxel_size=0.04)
    kpfcn = dataclasses.replace(base.kpfcn, first_subsampling_dl=0.01)
    return dataclasses.replace(
        base,
        kpfcn=kpfcn,
        coarse_transformer=transformer,
        procrustes=procrustes,
        variant="4dmatch",
    )


def preset_tiny(variant: str = "3dmatch", sample_steps: int = 2) -> PipelineConfig:
    """Small config for tests: same topology, tiny dims."""
    base = preset_3dmatch(sample_steps=sample_steps) if variant == "3dmatch" \
        else preset_4dmatch(sample_steps=sample_steps)
    matching = dataclasses.replace(base.coarse_matching, feature_dim=48)
    transformer = dataclasses.replace(
        base.coarse_transformer, feature_dim=48, n_head=2, feature_matching=matching,
        flash_attention=False)  # interpret-mode Pallas is too slow for CPU tests
    kpfcn = dataclasses.replace(
        base.kpfcn, first_feats_dim=16, coarse_feature_dim=48,
        fine_feature_dim=16, first_subsampling_dl=0.06)
    return dataclasses.replace(
        base, kpfcn=kpfcn, coarse_transformer=transformer, coarse_matching=matching)
