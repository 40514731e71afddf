"""Convert frozen-tower torch checkpoints (DINOv2 ViT, DepthAnything DPT)
into diffreg_tpu flax params.

Sources: facebookresearch/dinov2 releases (dinov2_vitl14_pretrain.pth) and
LiheYoung/depth_anything_vitl14 — the towers the reference loads at
encoders.py:81 and model.py:273. Run offline once the weights are available:

    python tools/convert_towers.py dinov2 dinov2_vitl14_pretrain.pth out/
    python tools/convert_towers.py depth_anything depth_anything_vitl14.pth out/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_dinov2(sd):
    """torch dinov2 state_dict -> flax params dict for DinoVisionTransformer."""
    import numpy as np

    p = {}
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    # patch embed: torch conv [D, C, k, k] -> flax [k, k, C, D]
    w = sd["patch_embed.proj.weight"]
    p["patch_embed"] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                        "bias": sd["patch_embed.proj.bias"]}
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        blk = {
            "norm1": {"scale": sd[f"blocks.{i}.norm1.weight"],
                      "bias": sd[f"blocks.{i}.norm1.bias"]},
            "attn": {
                "qkv": {"kernel": sd[f"blocks.{i}.attn.qkv.weight"].T,
                        "bias": sd[f"blocks.{i}.attn.qkv.bias"]},
                "proj": {"kernel": sd[f"blocks.{i}.attn.proj.weight"].T,
                         "bias": sd[f"blocks.{i}.attn.proj.bias"]},
            },
            "ls1": {"gamma": sd[f"blocks.{i}.ls1.gamma"]},
            "norm2": {"scale": sd[f"blocks.{i}.norm2.weight"],
                      "bias": sd[f"blocks.{i}.norm2.bias"]},
            "mlp_fc1": {"kernel": sd[f"blocks.{i}.mlp.fc1.weight"].T,
                        "bias": sd[f"blocks.{i}.mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[f"blocks.{i}.mlp.fc2.weight"].T,
                        "bias": sd[f"blocks.{i}.mlp.fc2.bias"]},
            "ls2": {"gamma": sd[f"blocks.{i}.ls2.gamma"]},
        }
        p[f"block{i}"] = blk
        i += 1
    p["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return p


def _conv(sd, key, bias=True):
    """torch Conv2d [O, I, kh, kw] -> flax {'kernel': [kh, kw, I, O], ...}."""
    import numpy as np

    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv_t(sd, key):
    """torch ConvTranspose2d [I, O, kh, kw] -> flax ConvTranspose
    {'kernel': [kh, kw, I, O], ...} (non-overlapping k==s layers)."""
    import numpy as np

    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 0, 1)),
            "bias": sd[f"{key}.bias"]}


def convert_vgg19(sd, prefix="features."):
    """torchvision vgg19_bn().features[:40] state_dict -> (params,
    batch_stats) for diffreg_tpu.nn.encoders.VGG19BN.

    torchvision layer indices: convs at 0,3 | 7,10 | 14,17,20,23 |
    27,30,33,36 with BN at +1 (encoders.py VGG19 uses features[:40])."""
    conv_idx = (0, 3, 7, 10, 14, 17, 20, 23, 27, 30, 33, 36)
    params, stats = {}, {}
    for li, ti in enumerate(conv_idx):
        params[f"conv{li}"] = _conv(sd, f"{prefix}{ti}")
        params[f"bn{li}"] = {"scale": sd[f"{prefix}{ti + 1}.weight"],
                             "bias": sd[f"{prefix}{ti + 1}.bias"]}
        stats[f"bn{li}"] = {"mean": sd[f"{prefix}{ti + 1}.running_mean"],
                            "var": sd[f"{prefix}{ti + 1}.running_var"]}
    return params, stats


def convert_dpt_head(sd, prefix="depth_head."):
    """DepthAnything DPTHead state_dict -> flax params for
    diffreg_tpu.nn.depth_anything.DPTHead (dpt.py:22-135 layout)."""
    p = {}
    for i in range(4):
        p[f"project{i}"] = _conv(sd, f"{prefix}projects.{i}")
        p[f"rn{i}"] = _conv(sd, f"{prefix}scratch.layer{i + 1}_rn", bias=False)
    p["resize0"] = _conv_t(sd, f"{prefix}resize_layers.0")
    p["resize1"] = _conv_t(sd, f"{prefix}resize_layers.1")
    p["resize3"] = _conv(sd, f"{prefix}resize_layers.3")
    for i in range(1, 5):
        r = f"{prefix}scratch.refinenet{i}"
        p[f"fusion{i}"] = {
            "rcu1": {"conv1": _conv(sd, f"{r}.resConfUnit1.conv1"),
                     "conv2": _conv(sd, f"{r}.resConfUnit1.conv2")},
            "rcu2": {"conv1": _conv(sd, f"{r}.resConfUnit2.conv1"),
                     "conv2": _conv(sd, f"{r}.resConfUnit2.conv2")},
            "out_conv": _conv(sd, f"{r}.out_conv"),
        }
    p["head_conv1"] = _conv(sd, f"{prefix}scratch.output_conv1")
    p["head_conv2"] = _conv(sd, f"{prefix}scratch.output_conv2.0")
    p["head_conv3"] = _conv(sd, f"{prefix}scratch.output_conv2.2")
    return p


def convert_depth_anything(sd):
    """Full DepthAnything (DPT_DINOv2) -> {'encoder': ..., 'head': ...}."""
    enc = {k[len("pretrained."):]: v for k, v in sd.items()
           if k.startswith("pretrained.")}
    return {"encoder": convert_dinov2(enc), "head": convert_dpt_head(sd)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["dinov2", "depth_anything", "vgg19"])
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    args = ap.parse_args()

    import numpy as np
    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    if args.kind == "dinov2":
        params = convert_dinov2(sd)
    elif args.kind == "vgg19":
        p, stats = convert_vgg19(sd)
        params = {"params": p, "batch_stats": stats}
    else:
        params = convert_depth_anything(sd)

    import orbax.checkpoint as ocp

    ocp.StandardCheckpointer().save(os.path.abspath(args.out_dir),
                                    {"params": params}, force=True)
    print(f"saved {args.out_dir}")


if __name__ == "__main__":
    main()
