"""Config system: reference-schema YAML -> typed PipelineConfig tree.

Accepts the reference's YAML layout (Diff-Reg-3dmatch/configs/test/
3dmatch.yaml) including the custom ``!join`` tag (main.py:17-21), so a user
of the reference can point this framework at their existing configs:

    python -m diffreg_tpu.main --config configs/test/3dmatch.yaml
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import yaml


def _join_tag(loader, node):
    seq = loader.construct_sequence(node)
    return "_".join(str(i) for i in seq)


def load_yaml(path: str) -> Dict[str, Any]:
    loader = yaml.SafeLoader
    # register on a subclass to avoid mutating the global SafeLoader
    class _Loader(yaml.SafeLoader):
        pass

    _Loader.add_constructor("!join", _join_tag)
    with open(path) as f:
        return yaml.load(f, Loader=_Loader)


def build_pipeline_config(raw: Dict[str, Any]):
    """Map the reference YAML schema onto PipelineConfig."""
    from ..nn.kpfcn import KPFCNConfig
    from ..nn.matching import MatchingConfig
    from ..nn.transformer import ProcrustesConfig, TransformerConfig
    from ..models.diffusion_matching import PipelineConfig
    from ..models.presets import KPFCN_ARCHITECTURE

    kp = raw.get("kpfcn_config", {})
    cm = raw.get("coarse_matching", {})
    ct = raw.get("coarse_transformer", {})
    pr = ct.get("procrustes", {})
    dataset = str(raw.get("dataset", "3dmatch"))

    matching = MatchingConfig(
        feature_dim=int(cm.get("feature_dim", 432)),
        match_type=cm.get("match_type", "sinkhorn"),
        confidence_threshold=float(cm.get("confidence_threshold", 0.2)),
        dsmax_temperature=float(cm.get("dsmax_temperature", 0.1)),
        skh_init_bin_score=float(cm.get("skh_init_bin_score", 1.0)),
        skh_iters=int(cm.get("skh_iters", 3)),
        entangled=bool(cm.get("entangled", False)),
    )
    procrustes = ProcrustesConfig(
        sample_rate=float(pr.get("sample_rate", 1.0)),
        max_condition_num=float(pr.get("max_condition_num", 0.0)),
        # real (masked) lengths everywhere: the reference's padded lengths
        # (procrustes.py:61-62) equal real lengths at eval B=1, and OUR
        # bucket padding must not widen the weight budget (see presets.py)
        use_masked_lengths=True,
    )
    compute_dtype = raw.get("compute_dtype")  # 'bfloat16' = fast path
    transformer = TransformerConfig(
        feature_dim=int(ct.get("feature_dim", 432)),
        n_head=int(ct.get("n_head", 4)),
        layer_types=tuple(ct.get("layer_types",
                                 ["self", "cross", "positioning", "self", "cross"])),
        positioning_type=ct.get("positioning_type", "procrustes"),
        pe_type=ct.get("pe_type", "rotary"),
        vol_origin=tuple(ct.get("vol_bnds", [[-3.6, -2.4, 1.14]])[0]),
        voxel_size=float(ct.get("voxel_size", 0.08)),
        entangled=bool(ct.get("entangled", False)),
        procrustes=procrustes,
        feature_matching=matching,
        flash_attention=bool(ct.get("flash_attention", False)),
        compute_dtype=compute_dtype,
    )
    kpfcn = KPFCNConfig(
        architecture=tuple(raw.get("architecture", KPFCN_ARCHITECTURE)),
        num_kernel_points=int(kp.get("num_kernel_points", 15)),
        in_points_dim=int(kp.get("in_points_dim", 3)),
        first_feats_dim=int(kp.get("first_feats_dim", 256)),
        in_feats_dim=int(kp.get("in_feats_dim", 1)),
        first_subsampling_dl=float(kp.get("first_subsampling_dl", 0.025)),
        conv_radius=float(kp.get("conv_radius", 2.5)),
        kp_extent=float(kp.get("KP_extent", 2.0)),
        kp_influence=kp.get("KP_influence", "linear"),
        aggregation_mode=kp.get("aggregation_mode", "sum"),
        use_batch_norm=bool(kp.get("use_batch_norm", True)),
        batch_norm_momentum=float(kp.get("batch_norm_momentum", 0.02)),
        coarse_feature_dim=int(kp.get("coarse_feature_dim", 432)),
        fine_feature_dim=int(kp.get("fine_feature_dim", 264)),
        coarse_level=int(kp.get("coarse_level", -2)),
        compute_dtype=compute_dtype,
        # deformable family: block names containing 'deform' in
        # `architecture` turn it on per block; `modulated` is the global
        # switch the reference reads from config (blocks.py:552)
        modulated=bool(kp.get("modulated", raw.get("modulated", False))),
    )
    return PipelineConfig(
        kpfcn=kpfcn,
        coarse_transformer=transformer,
        coarse_matching=matching,
        procrustes=procrustes,
        sample_steps=int(raw.get("SAMPLE_STEP", 20)),
        variant=dataset,
    )


def build_loss_config(raw: Dict[str, Any]):
    from ..engine.losses import LossConfig

    tl = raw.get("train_loss", {})
    return LossConfig(
        focal_alpha=float(tl.get("focal_alpha", 0.25)),
        focal_gamma=float(tl.get("focal_gamma", 2.0)),
        pos_weight=float(tl.get("pos_weight", 1.0)),
        neg_weight=float(tl.get("neg_weight", 1.0)),
        motion_weight=float(tl.get("motion_weight", 0.0)),
        match_weight=float(tl.get("match_weight", 1.0)),
        match_type=tl.get("match_type", "sinkhorn"),
        dataset=str(raw.get("dataset", "3dmatch")),
    )


def build_optim_config(raw: Dict[str, Any], steps_per_epoch: int = 1000,
                       world_size: int = 1):
    from ..engine.train import OptimConfig

    # DDP lr scaling: the reference multiplies every param group's lr by
    # world_size when distributed (vision3d/engine/base_trainer.py:205-210).
    # Linear-scaling-rule default; `scale_lr_by_world: false` disables it.
    lr = float(raw.get("lr", 0.015))
    if world_size > 1 and bool(raw.get("scale_lr_by_world", True)):
        lr *= world_size

    return OptimConfig(
        optimizer=str(raw.get("optimizer", "SGD")).lower(),
        lr=lr,
        momentum=float(raw.get("momentum", 0.93)),
        weight_decay=float(raw.get("weight_decay", 1e-6)),
        scheduler_gamma=float(raw.get("scheduler_gamma", 0.95)),
        steps_per_epoch=steps_per_epoch,
        grad_accum_steps=int(raw.get("iter_size", 1)),
    )
