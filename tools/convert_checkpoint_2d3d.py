"""Convert reference MATR2D3D torch checkpoints (Diff-Reg-2d3d experiment
snapshots) into this framework's DiffReg2D3D flax variables.

Covers the TRAINABLE surface of the experiment model (model.py:160-281):
image backbone UNet, point backbone KPConv pyramid, both cross-modal fusion
transformers, both matchers, and the dino_2_u projection. The frozen towers
(DINOv2 / DepthAnything / VGG19) are converted separately by
tools/convert_towers.py; their state_dict entries (prefixes ``encoder.`` and
``depth_model.``) are dropped here. ``depth_coffa/b`` are NOT in the torch
state_dict (the reference assigns raw requires_grad tensors that never reach
the optimizer, model.py:273-275), so our parameters keep their init values
(1, 0) — which is exactly the reference's effective behavior.

Layout rules:
  nn.Linear weight [out, in]      -> Dense kernel [in, out] (transpose)
  nn.Conv2d weight [O, I, H, W]   -> flax Conv kernel [H, W, I, O]
  norm weight/bias                -> scale/bias
  KPConv weights [K, Cin, Cout]   -> same layout; kernel_points -> buffers

Run:  python tools/convert_checkpoint_2d3d.py <snapshot.pth> <out_dir>
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEAD_PREFIXES = (
    "encoder.",          # CNNandDinov2 tower (convert_towers.py)
    "depth_model.",      # DepthAnything tower (convert_towers.py)
    "coarse_target.",    # SuperPointProposalGenerator (parameterless/unused)
    "alphas_cumprod", "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
)
DEAD_SUFFIXES = ("tgt_proj.weight",)  # matcher applies src_proj to both sides


def _dense(dst, flat, tkey, fkey):
    if tkey + ".weight" in flat:
        dst[fkey + "/kernel"] = np.ascontiguousarray(flat[tkey + ".weight"].T)
    if tkey + ".bias" in flat:
        dst[fkey + "/bias"] = np.ascontiguousarray(flat[tkey + ".bias"])


def _conv2d(dst, flat, tkey, fkey):
    w = flat[tkey + ".weight"]                     # [O, I, H, W]
    dst[fkey + "/kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    if tkey + ".bias" in flat:
        dst[fkey + "/bias"] = np.ascontiguousarray(flat[tkey + ".bias"])


def _norm(dst, flat, tkey, fkey):
    dst[fkey + "/scale"] = flat[tkey + ".weight"]
    dst[fkey + "/bias"] = flat[tkey + ".bias"]


def convert_state_dict_2d3d(sd):
    """Return (params_flat, buffers_flat) as {'/'-path: np.ndarray}."""
    flat = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
    params: dict = {}
    buffers: dict = {}

    # ---- image backbone -------------------------------------------------
    def conv_block(tp, fp):
        _conv2d(params, flat, tp + ".conv", fp + "/Conv_0")
        if tp + ".norm.weight" in flat:
            _norm(params, flat, tp + ".norm", fp + "/GroupNorm_0")

    conv_block("img_backbone.encoder1", "img_backbone/encoder1")
    for enc, n_blocks in (("encoder2", 2), ("encoder3", 2), ("encoder4", 2)):
        for i in range(n_blocks):
            tp = f"img_backbone.{enc}.{i}"
            fp = f"img_backbone/{enc}_{i}"
            conv_block(tp + ".conv1", fp + "/conv1")
            conv_block(tp + ".conv2", fp + "/conv2")
            if tp + ".identity.conv.weight" in flat:
                conv_block(tp + ".identity", fp + "/identity")
    for dec in ("decoder4_1", "decoder3_1", "decoder2_1", "decoder1_1"):
        conv_block(f"img_backbone.{dec}", f"img_backbone/{dec}")
    for dec in ("decoder3_2", "decoder2_2", "decoder1_2"):
        for i in range(2):
            conv_block(f"img_backbone.{dec}.{i}", f"img_backbone/{dec}_{i}")
    conv_block("img_backbone.out_proj", "img_backbone/out_proj")

    # ---- point backbone -------------------------------------------------
    def kpconv_block(tp, fp):
        # reference KPConvBlock: conv (KPConv w/ bias) + norm (GroupNormPack)
        params[fp + "/conv/kpconv/weights"] = flat[tp + ".conv.weights"]
        params[fp + "/conv/bias"] = flat[tp + ".conv.bias"]
        buffers[fp + "/conv/kpconv/kernel_points"] = flat[tp + ".conv.kernel_points"]
        _norm(params, flat, tp + ".norm.norm", fp + "/norm")

    def unary_block(tp, fp):
        _dense(params, flat, tp + ".mlp", fp + "/mlp")
        _norm(params, flat, tp + ".norm.norm", fp + "/norm")

    def kp_residual(tp, fp):
        unary_block(tp + ".unary1", fp + "/unary1")
        kpconv_block(tp + ".conv", fp + "/conv")
        unary_block(tp + ".unary2", fp + "/unary2")
        if tp + ".unary_shortcut.mlp.weight" in flat:
            unary_block(tp + ".unary_shortcut", fp + "/unary_shortcut")

    kpconv_block("pcd_backbone.encoder1_1", "pcd_backbone/encoder1_1")
    for blk in ("encoder1_2", "encoder2_1", "encoder2_2", "encoder2_3",
                "encoder3_1", "encoder3_2", "encoder3_3"):
        kp_residual(f"pcd_backbone.{blk}", f"pcd_backbone/{blk}")
    unary_block("pcd_backbone.decoder2", "pcd_backbone/decoder2")
    unary_block("pcd_backbone.decoder1", "pcd_backbone/decoder1")
    _dense(params, flat, "pcd_backbone.out_proj", "pcd_backbone/out_proj")

    # ---- fusion transformers -------------------------------------------
    def fusion(tp, fp):
        for name in ("img_in_proj", "img_in_proj_dino", "img_in_proj_all",
                     "pcd_in_proj", "img_emb_proj", "pcd_emb_proj", "out_proj"):
            _dense(params, flat, f"{tp}.{name}", f"{fp}/{name}")
        i = 0
        while f"{tp}.transformer.{i}.attention.linear.weight" in flat:
            lt = f"{tp}.transformer.{i}"
            lf = f"{fp}/transformer{i}"
            for name in ("q_token_layer", "k_token_layer", "v_token_layer"):
                _dense(params, flat, f"{lt}.attention.attention.{name}",
                       f"{lf}/attention/{name}")
            _dense(params, flat, f"{lt}.attention.linear", f"{lf}/linear")
            _norm(params, flat, f"{lt}.attention.norm", f"{lf}/norm1")
            _dense(params, flat, f"{lt}.output.expand", f"{lf}/expand")
            _dense(params, flat, f"{lt}.output.squeeze", f"{lf}/squeeze")
            _norm(params, flat, f"{lt}.output.norm", f"{lf}/norm2")
            i += 1

    fusion("transformer", "fusion")
    fusion("denoising_transformer", "denoising_fusion")

    # ---- matchers + dino projection ------------------------------------
    for tp, fp in (("coarse_matching", "coarse_matching"),
                   ("denoising_coarse_matching", "denoising_matching")):
        _dense(params, flat, f"{tp}.src_proj", f"{fp}/src_proj")
        params[f"{fp}/bin_score"] = flat[f"{tp}.bin_score"]
    _dense(params, flat, "dino_2_u", "dino_proj")

    return params, buffers


def graft_2d3d(variables, params_flat, buffers_flat):
    """Graft converted arrays into DiffReg2D3D variables; raises on any
    unmatched target EXCEPT depth_coffa/b (kept at init — see module doc)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    out = dict(variables)
    for col, src in (("params", params_flat), ("buffers", buffers_flat)):
        tgt = {"/".join(k): v for k, v in flatten_dict(dict(variables.get(col, {}))).items()}
        new_flat = {}
        missing = []
        for key, cur in tgt.items():
            if key in ("depth_coffa", "depth_coffb") and key not in src:
                new_flat[key] = jnp.asarray(
                    np.ones(cur.shape) if key.endswith("a") else np.zeros(cur.shape),
                    dtype=cur.dtype)
                continue
            if key not in src:
                missing.append(key)
                continue
            arr = jnp.asarray(src[key], dtype=cur.dtype)
            if tuple(arr.shape) != tuple(cur.shape):
                raise ValueError(f"{col}/{key}: shape {arr.shape} != {cur.shape}")
            new_flat[key] = arr
        if missing:
            raise ValueError(f"{col}: no converted source for {missing[:10]}"
                             f" (+{max(0, len(missing) - 10)} more)")
        extra = sorted(set(src) - set(tgt))
        if extra:
            raise ValueError(f"{col}: converted keys with no slot: {extra[:10]}")
        out[col] = unflatten_dict({tuple(k.split("/")): v for k, v in new_flat.items()})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    sd = {k: v for k, v in sd.items()
          if not k.startswith(DEAD_PREFIXES) and not k.endswith(DEAD_SUFFIXES)}
    params_flat, buffers_flat = convert_state_dict_2d3d(sd)
    print(f"converted {len(params_flat)} params, {len(buffers_flat)} buffers")

    import jax

    from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig

    cfg = Pipeline2D3DConfig(
        use_dino=True, use_mono_depth=True, coarse_stride=14,
        pcd_backbone=PointBackboneConfig(output_dim=128, init_dim=64),
        matching=MatchingConfig(feature_dim=256), sample_steps=args.steps)
    model = DiffReg2D3D(cfg)
    batch = synthetic_2d3d_batch(batch_size=1, img_hw=(56, 56), n_points=256,
                                 seed=0, coarse_stride=14, with_dino=True,
                                 with_mono_depth=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, batch, rng, mode="train")
    variables = graft_2d3d(variables, params_flat, buffers_flat)
    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, variables)
    mgr.close()
    print(f"saved to {args.out_dir}")


if __name__ == "__main__":
    main()
