"""PointNet / PointNet++ / PointTransformer / PAT / FoldingNet families
(vision3d/models/{pointnet,pointnet2,point_transformer,pat,foldingnet}).

TPU-native conventions vs the torch reference:
  * channel-LAST [B, N, C] everywhere (the reference is [B, C, N]; Conv1d
    kernel-size-1 stacks become Dense layers — identical math, MXU-friendly
    lanes);
  * neighborhoods are dense batched knn/ball-query (B x N x M distance +
    top_k) — the library models run at <= a few k points where one fused
    distance matrix beats scatter kernels on TPU;
  * torch BatchNorm1d is LayerNorm-free inference-style normalization here:
    we use GroupNorm/InstanceNorm twins where the reference semantics matter
    and plain feature norms otherwise (noted per layer).

References cited per class.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import farthest_point_sampling
from ..ops.vision import pairwise_distance


# ---------------------------------------------------------------------------
# shared batched neighborhood helpers


def batched_knn(queries, supports, k: int, exclude_self: bool = False):
    """[B, N, 3] x [B, M, 3] -> neighbor indices [B, N, k] (nearest first)."""
    d = pairwise_distance(queries, supports, squared=True)
    if exclude_self:
        n = queries.shape[1]
        d = d + jnp.eye(n, d.shape[-1], dtype=d.dtype) * 1e10
    _, idx = jax.lax.top_k(-d, k)
    return idx


def batched_ball_query(queries, supports, k: int, radius: float):
    """Ball query (pointnet2 CUDA ball_query twin): k nearest within radius;
    indices outside the ball repeat the nearest-in-ball index (the CUDA
    kernel repeats the FIRST found index — same set semantics)."""
    d = pairwise_distance(queries, supports, squared=True)
    negd, idx = jax.lax.top_k(-d, k)
    within = (-negd) <= radius * radius
    return jnp.where(within, idx, idx[..., :1])


def group_gather(feats, indices):
    """[B, M, C] gathered by [B, N, k] -> [B, N, k, C]."""
    return jax.vmap(lambda f, i: f[i])(feats, indices)


def batched_fps(points, num_samples: int, valid=None):
    """Batched farthest point sampling: [B, N, 3] -> indices [B, S]."""
    if valid is None:
        valid = jnp.ones(points.shape[:2], bool)
    idx, _ = jax.vmap(lambda p, v: farthest_point_sampling(p, v, num_samples))(
        points, valid)
    return idx


# ---------------------------------------------------------------------------
# PointNet (vision3d/models/pointnet/modules.py)


class TNet(nn.Module):
    """Spatial/feature transform regressor (pointnet/modules.py:7-38).

    Input [B, N, input_dim] -> transform [B, input_dim, input_dim]; the
    final affine layer is zero-init weight + identity bias, exactly the
    reference's nn.Parameter scheme."""
    input_dim: int
    local_dims: Sequence[int]
    global_dims: Sequence[int]

    @nn.compact
    def __call__(self, points, mask=None):
        x = points
        for i, d in enumerate(self.local_dims):
            x = nn.Dense(d, use_bias=False, name=f"local{i}")(x)
            x = nn.LayerNorm(name=f"local_norm{i}", epsilon=1e-5)(x)
            x = nn.relu(x)
        if mask is not None:
            x = jnp.where(mask[..., None], x, -1e10)
        x = jnp.max(x, axis=1)                     # global max pool
        for i, d in enumerate(self.global_dims):
            x = nn.Dense(d, use_bias=False, name=f"global{i}")(x)
            x = nn.LayerNorm(name=f"global_norm{i}", epsilon=1e-5)(x)
            x = nn.relu(x)
        w = self.param("weight", nn.initializers.zeros,
                       (self.global_dims[-1], self.input_dim * self.input_dim))
        bias = self.param("bias", lambda _: jnp.eye(self.input_dim).reshape(-1))
        t = x @ w + bias
        return t.reshape(-1, self.input_dim, self.input_dim)


def tnet_loss(transforms):
    """|| I - T T^T ||^2 / 2 (pointnet/modules.py:41-54)."""
    eye = jnp.eye(transforms.shape[-1], dtype=transforms.dtype)
    delta = eye - transforms @ jnp.swapaxes(transforms, -1, -2)
    return jnp.sum(delta ** 2) / 2.0


def pointnet_loss(outputs, labels, transforms, alpha: float = 0.001,
                  label_smoothing_eps: Optional[float] = None):
    """Classification + TNet regularizer (pointnet/modules.py:57-71).
    outputs: [B, C] logits (or [B, C, *] for dense tasks)."""
    from ..engine.loss_library import smooth_cross_entropy_loss
    if outputs.ndim == 2:
        outputs = outputs[..., None]
        labels = labels[..., None]
    if label_smoothing_eps is None:
        logp = jax.nn.log_softmax(outputs, axis=1)
        one_hot = jax.nn.one_hot(labels, outputs.shape[1], axis=1, dtype=logp.dtype)
        cls = -jnp.mean(jnp.sum(one_hot * logp, axis=1))
    else:
        cls = smooth_cross_entropy_loss(outputs, labels, eps=label_smoothing_eps)
    reg = alpha * tnet_loss(transforms)
    return cls + reg, cls, reg


# ---------------------------------------------------------------------------
# PointNet++ (vision3d/models/pointnet2/modules.py + layers SAConv/GSAConv)


class _SharedMLP(nn.Module):
    """SAConv body: pointwise Dense + norm + ReLU stack over [B, N, k, C]."""
    dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=False, name=f"mlp{i}")(x)
            x = nn.LayerNorm(name=f"norm{i}", epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class SetAbstractionModule(nn.Module):
    """FPS -> ball query -> shared MLP over [centered xyz ++ feats] -> max
    pool (pointnet2/modules.py:9-32 + layers SAConv)."""
    output_dims: Sequence[int]
    num_centroids: int
    num_samples: int
    radius: float

    @nn.compact
    def __call__(self, s_points, s_feats=None):
        idx = batched_fps(s_points, self.num_centroids)
        q_points = group_gather(s_points, idx[..., None])[:, :, 0]   # [B, S, 3]
        nbr = batched_ball_query(q_points, s_points, self.num_samples, self.radius)
        nbr_points = group_gather(s_points, nbr) - q_points[:, :, None, :]
        x = nbr_points
        if s_feats is not None:
            x = jnp.concatenate([x, group_gather(s_feats, nbr)], axis=-1)
        x = _SharedMLP(self.output_dims, name="set_abstract")(x)
        return q_points, jnp.max(x, axis=2)


class MultiScaleSetAbstractionModule(nn.Module):
    """MSG variant: several (radius, num_samples, dims) branches concat
    (pointnet2/modules.py:35-58)."""
    num_centroids: int
    ssg_cfgs: Tuple[dict, ...]    # each: {'output_dims', 'num_samples', 'radius'}

    @nn.compact
    def __call__(self, s_points, s_feats=None):
        idx = batched_fps(s_points, self.num_centroids)
        q_points = group_gather(s_points, idx[..., None])[:, :, 0]
        outs = []
        for i, cfg in enumerate(self.ssg_cfgs):
            nbr = batched_ball_query(q_points, s_points, cfg["num_samples"],
                                     cfg["radius"])
            x = group_gather(s_points, nbr) - q_points[:, :, None, :]
            if s_feats is not None:
                x = jnp.concatenate([x, group_gather(s_feats, nbr)], axis=-1)
            x = _SharedMLP(cfg["output_dims"], name=f"ssg{i}")(x)
            outs.append(jnp.max(x, axis=2))
        return q_points, jnp.concatenate(outs, axis=-1)


class GlobalAbstractionModule(nn.Module):
    """Whole-cloud abstraction (pointnet2/modules.py:61-68 + GSAConv):
    shared MLP over [xyz ++ feats] then global max -> [B, 1, C]."""
    output_dims: Sequence[int]

    @nn.compact
    def __call__(self, points, feats=None, mask=None):
        x = points if feats is None else jnp.concatenate([points, feats], -1)
        x = _SharedMLP(self.output_dims, name="global_abstract")(x)
        if mask is not None:
            x = jnp.where(mask[..., None], x, -1e10)
        return jnp.max(x, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# PointTransformer (vision3d/models/point_transformer/modules.py)


class PointTransformerLayer(nn.Module):
    """Vector attention over knn neighborhoods
    (point_transformer/modules.py:10-39): softmax over the neighbor axis of
    an MLP-encoded (k - q + delta), values v + delta."""
    feature_dim: int

    @nn.compact
    def __call__(self, feats, grouped_feats, points, grouped_points):
        def mlp2(x, name):
            x = nn.Dense(self.feature_dim, name=f"{name}0")(x)
            x = nn.relu(x)
            return nn.Dense(self.feature_dim, name=f"{name}1")(x)

        delta = mlp2(points[:, :, None, :] - grouped_points, "position_encoding")
        k = nn.Dense(self.feature_dim, name="k_layer")(feats)[:, :, None, :]
        q = nn.Dense(self.feature_dim, name="q_layer")(grouped_feats)
        v = nn.Dense(self.feature_dim, name="v_layer")(grouped_feats) + delta
        scores = jax.nn.softmax(mlp2(k - q + delta, "attention_encoding"), axis=2)
        return jnp.sum(scores * v, axis=2)


class PointTransformerBlock(nn.Module):
    """Residual PT block (point_transformer/modules.py:42-60)."""
    output_dim: int
    hidden_dim: int
    num_neighbors: int

    @nn.compact
    def __call__(self, feats, points):
        identity = feats
        x = nn.Dense(self.hidden_dim, name="r_layer")(feats)
        idx = batched_knn(points, points, self.num_neighbors)
        gf = group_gather(x, idx)
        gp = group_gather(points, idx)
        x = PointTransformerLayer(self.hidden_dim, name="point_transformer")(
            x, gf, points, gp)
        x = nn.Dense(self.output_dim, name="e_layer")(x)
        return x + identity, points


class TransitionDownBlock(nn.Module):
    """MLP -> FPS by ratio -> knn mean pool
    (point_transformer/modules.py:63-87)."""
    output_dim: int
    downsample_ratio: int
    num_neighbors: int

    @nn.compact
    def __call__(self, feats, points):
        x = feats
        for i in range(2):
            x = nn.Dense(self.output_dim, use_bias=False, name=f"transition{i}")(x)
            x = nn.LayerNorm(name=f"norm{i}", epsilon=1e-5)(x)
            x = nn.relu(x)
        num_sample = -(-points.shape[1] // self.downsample_ratio)
        idx = batched_fps(points, num_sample)
        centroids = group_gather(points, idx[..., None])[:, :, 0]
        nbr = batched_knn(centroids, points, self.num_neighbors)
        return jnp.mean(group_gather(x, nbr), axis=2), centroids


# ---------------------------------------------------------------------------
# PAT (vision3d/models/pat/modules.py)


class _PATBlocks(nn.Module):
    """conv/linear + GroupNorm(8) + ELU stacks (pat/functional.py:8-51)."""
    dims: Sequence[int]
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=False, name=f"fc{i + 1}")(x)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name=f"gn{i + 1}")(x)
            x = nn.elu(x)
        return x


class AbsoluteRelativePositionEmbedding(nn.Module):
    """ARPE (pat/modules.py:25-52): knn graph [x ++ (nbr - x)] -> conv2d
    stack -> max over neighbors -> conv1d stack."""
    output_dims1: Sequence[int]
    output_dims2: Sequence[int]
    num_neighbor: int
    dilation: int = 1
    ignore_nearest: bool = True

    @nn.compact
    def __call__(self, points, training: bool = True):
        k_dilated = self.num_neighbor * self.dilation + int(self.ignore_nearest)
        idx = batched_knn(points, points, k_dilated)
        start = 1 if self.ignore_nearest else 0
        idx = idx[:, :, start::self.dilation] if training else idx[:, :, start:]
        nbrs = group_gather(points, idx)
        x = jnp.concatenate(
            [jnp.broadcast_to(points[:, :, None, :], nbrs.shape),
             nbrs - points[:, :, None, :]], axis=-1)
        x = _PATBlocks(self.output_dims1, name="pointnet1")(x)
        x = jnp.max(x, axis=2)
        return _PATBlocks(self.output_dims2, name="pointnet2")(x)


class GroupShuffleAttention(nn.Module):
    """GSA (pat/modules.py:73-94): grouped transform + scaled-dot attention
    inside each group + residual + GroupNorm. Channel-last twin of the
    reference's [B, C, N] formulation."""
    feature_dim: int
    groups: int

    @nn.compact
    def __call__(self, feats):
        b, n, c = feats.shape
        g = self.groups
        cg = c // g
        identity = feats
        # grouped 1x1 conv == blockdiag Dense per group
        x = feats.reshape(b, n, g, cg)
        w = self.param("transform", nn.initializers.lecun_normal(), (g, cg, cg))
        bb = self.param("transform_bias", nn.initializers.zeros, (g, cg))
        x = jnp.einsum("bngc,gcd->bngd", x, w) + bb
        x = x.transpose(0, 2, 1, 3)                           # [B, g, N, cg]
        # reference: attention = softmax(q k / sqrt(d), dim=-2), v = elu(x)
        att = jnp.einsum("bgnc,bgmc->bgnm", x, x) / jnp.sqrt(jnp.asarray(cg, x.dtype))
        att = jax.nn.softmax(att, axis=-2)
        out = jnp.einsum("bgnm,bgnc->bgmc", att, nn.elu(x))
        # the channel SHUFFLE: the reference flattens (cg, g) in that order
        # (modules.py:92 view after transpose(1, 2)), interleaving groups
        out = out.transpose(0, 2, 3, 1).reshape(b, n, c)
        out = out + identity
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, name="gn")(out)


class GumbelSubsetSampling(nn.Module):
    """GSS (pat/modules.py:97-117): soft Gumbel selection in training,
    hard (straight-through argmax) at eval."""
    num_sample: int
    tau: float = 1.0

    @nn.compact
    def __call__(self, feats, rng=None, training: bool = True):
        w = nn.Dense(self.num_sample, name="layer")(feats)   # [B, N, S]
        w = w.transpose(0, 2, 1)                             # [B, S, N]
        if training:
            assert rng is not None, "GumbelSubsetSampling needs an rng in training"
            g = jax.random.gumbel(rng, w.shape, dtype=w.dtype)
            w = jax.nn.softmax((w + g) / self.tau, axis=-1)
        else:
            hard = jax.nn.one_hot(jnp.argmax(w, axis=-1), w.shape[-1], dtype=w.dtype)
            w = hard
        return jnp.einsum("bsn,bnc->bsc", w, feats)


class AttentionSubsetSampling(nn.Module):
    """Deterministic softmax pooling variant (pat/modules.py:120-129)."""
    num_sample: int

    @nn.compact
    def __call__(self, feats):
        w = nn.Dense(self.num_sample, name="layer")(feats).transpose(0, 2, 1)
        w = jax.nn.softmax(w, axis=-1)
        return jnp.einsum("bsn,bnc->bsc", w, feats)


# ---------------------------------------------------------------------------
# FoldingNet (vision3d/models/foldingnet/foldingnet.py)


class FoldingNet(nn.Module):
    """Two-stage folding decoder (foldingnet.py:5-67): a steps x steps 2D
    seed grid is folded by MLPs conditioned on the global code."""
    input_dim: int
    hidden_dim: int
    steps: int

    def _fold(self, x, name):
        x = nn.Dense(self.hidden_dim, name=f"{name}0")(x)
        x = nn.LayerNorm(name=f"{name}_norm0", epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim // 2, name=f"{name}1")(x)
        x = nn.LayerNorm(name=f"{name}_norm1", epsilon=1e-5)(x)
        x = nn.relu(x)
        return nn.Dense(3, name=f"{name}2")(x)

    @nn.compact
    def __call__(self, global_feats):
        b = global_feats.shape[0]
        f = self.steps * self.steps
        lin = jnp.linspace(-1.0, 1.0, self.steps, dtype=global_feats.dtype)
        rows = jnp.repeat(lin, self.steps)
        cols = jnp.tile(lin, self.steps)
        seeds = jnp.stack([rows, cols], axis=-1)             # [F, 2]
        seeds = jnp.broadcast_to(seeds, (b, f, 2))
        feats = jnp.broadcast_to(global_feats[:, None, :], (b, f, self.input_dim))
        points = self._fold(jnp.concatenate([seeds, feats], -1), "grid_to_points")
        points = self._fold(jnp.concatenate([points, feats], -1), "refine_points")
        return points                                        # [B, F, 3]
