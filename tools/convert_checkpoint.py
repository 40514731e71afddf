"""Convert reference torch checkpoints (Diff-Reg model_13.pth / model_22.pth)
into this framework's flax variables.

The released checkpoints (reference README.md:12-14, DiffRegv1 tag) store a
``state_dict`` under 'state_dict' with the module names of
Diff-Reg-3dmatch/models/pipeline.py. Mapping rules:

  torch                                   flax (this repo)
  ------------------------------------    ---------------------------------
  backbone.encoder_blocks.<i>.*           backbone/enc<i>_<type>/*
  backbone.decoder_blocks.<i>.*           backbone/dec<i>_<type>/*
  backbone.coarse_out.{weight,bias}       backbone/coarse_out (Conv1d k=1 -> Dense)
  coarse_transformer.layers.<i>.*         coarse_transformer/layer<i>_<type>/*
  denoising_transformer.layers.<i>.*      denoising_transformer/layer<i>_<type>/*
  *_matching.{src_proj,tgt_proj,bin_score}  matcher params
  KPConv .weights [P, Cin, Cout]          same layout
  KPConv .kernel_points (buffer)          'buffers' collection (dispositions!)
  nn.Linear weight [out, in]              Dense kernel [in, out] (transpose)

Run:  python tools/convert_checkpoint.py <model.pth> <out_dir> [--config cfg.yaml]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def torch_to_flax_dense(w):
    return w.T


def convert_linear(dst, flat, tkey, fkey):
    import numpy as np

    if tkey + ".weight" in flat:
        dst[fkey + "/kernel"] = np.ascontiguousarray(flat[tkey + ".weight"].T)
    if tkey + ".bias" in flat:
        dst[fkey + "/bias"] = np.ascontiguousarray(flat[tkey + ".bias"])


def convert_state_dict(sd, architecture):
    """Return (params_flat, buffers_flat) as {path: np.ndarray} with '/'-paths.

    Handles the Lepard-lineage Pipeline layout. Layer-type names are derived
    from the architecture list the same way both codebases derive them.
    """
    import numpy as np

    flat = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
    params: dict = {}
    buffers: dict = {}

    enc_types = []
    for b in architecture:
        if "upsample" in b:
            break
        enc_types.append("unary" if b == "unary" else ("simple" if "simple" in b else "resnetb"))
    start = len(enc_types)
    dec_types = ["upsample" if "upsample" in b else "unary" for b in architecture[start:]]

    def put_kpconv(prefix_t, prefix_f):
        if prefix_t + ".weights" in flat:
            params[prefix_f + "/weights"] = flat[prefix_t + ".weights"]
        if prefix_t + ".kernel_points" in flat:
            buffers[prefix_f + "/kernel_points"] = flat[prefix_t + ".kernel_points"]

    def put_unary(prefix_t, prefix_f):
        convert_linear(params, flat, prefix_t + ".mlp", prefix_f + "/Dense_0")
        # norm has no params (InstanceNorm affine=False) or a bias
        if prefix_t + ".batch_norm.bias" in flat:
            params[prefix_f + "/NormBlock_0/bias"] = flat[prefix_t + ".batch_norm.bias"]

    # --- backbone ---
    for i, t in enumerate(enc_types):
        tp = f"backbone.encoder_blocks.{i}"
        fp = f"backbone/enc{i}_{t}"
        if t == "simple":
            put_kpconv(tp + ".KPConv", fp + "/KPConvLayer_0")
        elif t == "resnetb":
            put_unary(tp + ".unary1", fp + "/UnaryBlock_0")
            put_kpconv(tp + ".KPConv", fp + "/KPConvLayer_0")
            put_unary(tp + ".unary2", fp + "/UnaryBlock_1")
            if tp + ".unary_shortcut.mlp.weight" in flat:
                put_unary(tp + ".unary_shortcut", fp + "/UnaryBlock_2")
        elif t == "unary":
            put_unary(tp, fp + "/UnaryBlock_0")
    for i, t in enumerate(dec_types):
        tp = f"backbone.decoder_blocks.{i}"
        fp = f"backbone/dec{i}_{t}"
        if t == "unary":
            put_unary(tp, fp + "/UnaryBlock_0")
    # conv1d k=1 == dense on [N, C]: torch weight [out, in, 1]
    for head in ("coarse_out", "coarse_in", "fine_out"):
        k = f"backbone.{head}.weight"
        if k in flat:
            params[f"backbone/{head}/kernel"] = flat[k][:, :, 0].T
            params[f"backbone/{head}/bias"] = flat[f"backbone.{head}.bias"]

    # --- transformers + matchers ---
    def put_attention(tp, fp):
        for name in ("q_proj", "k_proj", "v_proj", "merge"):
            convert_linear(params, flat, f"{tp}.{name}", f"{fp}/{name}")
        convert_linear(params, flat, f"{tp}.mlp.0", f"{fp}/mlp0")
        convert_linear(params, flat, f"{tp}.mlp.2", f"{fp}/mlp1")
        for norm in ("norm1", "norm2"):
            if f"{tp}.{norm}.weight" in flat:
                params[f"{fp}/{norm}/scale"] = flat[f"{tp}.{norm}.weight"]
                params[f"{fp}/{norm}/bias"] = flat[f"{tp}.{norm}.bias"]

    def put_matcher(tp, fp):
        convert_linear(params, flat, f"{tp}.src_proj", f"{fp}/src_proj")
        convert_linear(params, flat, f"{tp}.tgt_proj", f"{fp}/tgt_proj")
        if f"{tp}.bin_score" in flat:
            params[f"{fp}/bin_score"] = flat[f"{tp}.bin_score"]

    layer_types = ["self", "cross", "positioning", "self", "cross"]
    for i, lt in enumerate(layer_types):
        tp = f"coarse_transformer.layers.{i}"
        if lt in ("self", "cross"):
            put_attention(tp, f"coarse_transformer/layer{i}_{lt}")
        else:
            put_matcher(tp + ".0", f"coarse_transformer/layer{i}_matching")
    for i, lt in enumerate(["self", "cross"] * 3):
        put_attention(f"denoising_transformer.layers.{i}",
                      f"denoising_transformer/layer{i}_{lt}")

    put_matcher("coarse_matching", "coarse_matching")
    put_matcher("denoising_coarse_matching", "denoising_matching")
    return params, buffers


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


# torch parameters with no counterpart in the flax forward graph: the
# reference checkpoint stores the FULL decoder (the live path stops at the
# coarse tap after decoder block 1, backbone.py:151-160), the never-applied
# tgt_proj (matching.py:173-174 applies src_proj to both sides), and the
# fine-phase heads. Dropping them loses nothing — they receive no gradient
# signal through the live loss either.
KNOWN_DEAD_PREFIXES = (
    "backbone/coarse_in/",
    "backbone/fine_out/",
    "backbone/dec2_", "backbone/dec3_", "backbone/dec4_", "backbone/dec5_",
)
KNOWN_DEAD_SUFFIXES = ("/tgt_proj/kernel", "/tgt_proj/bias")


def graft_into_variables(variables, params_flat, buffers_flat):
    """Graft converted arrays into a flax ``variables`` tree.

    Returns (new_variables, dropped) where ``dropped`` lists converted keys
    with no slot in the target tree. Raises if a target parameter has no
    converted source or a shape mismatches — a conversion bug, never OK.
    """
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    out = dict(variables)
    dropped = []
    for col, flat_src in (("params", params_flat), ("buffers", buffers_flat)):
        tgt = {"/".join(k): v for k, v in flatten_dict(dict(variables.get(col, {}))).items()}
        missing = sorted(set(tgt) - set(flat_src))
        if missing:
            raise ValueError(f"{col}: no converted source for {missing[:8]}"
                             f" (+{max(0, len(missing) - 8)} more)")
        new_flat = {}
        for key, cur in tgt.items():
            arr = jnp.asarray(flat_src[key], dtype=cur.dtype)
            if tuple(arr.shape) != tuple(cur.shape):
                raise ValueError(f"{col}/{key}: shape {arr.shape} != {cur.shape}")
            new_flat[key] = arr
        dropped += [k for k in flat_src if k not in tgt]
        out[col] = unflatten_dict({tuple(k.split("/")): v for k, v in new_flat.items()})
    unexpected = [k for k in dropped
                  if not (k.startswith(KNOWN_DEAD_PREFIXES) or k.endswith(KNOWN_DEAD_SUFFIXES))]
    if unexpected:
        raise ValueError(f"converted keys with no target slot and not known-dead: {unexpected}")
    return out, dropped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--variant", default="3dmatch", choices=["3dmatch", "4dmatch"])
    args = ap.parse_args()

    import torch

    from diffreg_tpu.models.presets import KPFCN_ARCHITECTURE

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    params_flat, buffers_flat = convert_state_dict(sd, KPFCN_ARCHITECTURE)
    print(f"converted {len(params_flat)} param tensors, {len(buffers_flat)} buffers")

    # init the target model so the saved tree matches what main.py restores
    import jax

    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch, preset_4dmatch

    cfg = preset_3dmatch() if args.variant == "3dmatch" else preset_4dmatch()
    model = DiffusionMatchingModel(cfg)
    batch, _, _ = synthetic_batch(batch_size=1, n_points=256, seed=0)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, batch, rng, mode="train")
    variables, dropped = graft_into_variables(variables, params_flat, buffers_flat)
    print(f"grafted; dropped {len(dropped)} known-dead reference params")

    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, variables)
    mgr.close()
    print(f"saved to {args.out_dir} (CheckpointManager step 0)")


if __name__ == "__main__":
    main()
