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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["dinov2", "depth_anything"])
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
    else:
        enc = {k[len("pretrained."):]: v for k, v in sd.items()
               if k.startswith("pretrained.")}
        params = {"encoder": convert_dinov2(enc)}
        # DPT head mapping is checkpoint-layout dependent; extend as needed.
        print("NOTE: depth head conversion covers the encoder; head mapping "
              "must be matched against the specific release layout.")

    import orbax.checkpoint as ocp

    ocp.StandardCheckpointer().save(os.path.abspath(args.out_dir),
                                    {"params": params}, force=True)
    print(f"saved {args.out_dir}")


if __name__ == "__main__":
    main()
