"""Static-shape batch structures.

The reference threads a ragged ``data_dict`` of packed tensors through the
model (collate_fn_3dmatch, datasets/dataloader.py:301-325). On TPU the same
information is a registered pytree of *padded, static-shape* arrays:

  * per level l: points [B, N_l, 3], validity mask [B, N_l], fixed-K neighbor
    tables with sentinel index N_l (the C++ wrappers already used exactly this
    padding convention — cpp_neighbors pads with index N);
  * pooling tables  pools[l]:     queries at level l+1 into level l supports;
  * upsample tables upsamples[l]: queries at level l into level l+1 supports
    (first column = nearest, for closest-pool);
  * coarse-level split indices that scatter the packed (src ++ tgt) cloud of
    each pair into padded [S] / [T] buffers (pipeline.py:350-379 equivalent);
  * ground truth: pose, coarse matches as index pairs (padded), 4DMatch flow.

Bucketed padding: a ``ShapeSpec`` pins every dimension; the data pipeline
rounds each pair up to its bucket so XLA compiles one program per bucket.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ShapeSpec:
    """Static shapes for one bucket of registration pairs.

    n_points[l]   — padded packed point count (src+tgt) at pyramid level l.
    k_neighbors[l]— neighbor K at level l.
    k_pools[l]    — pooling K from level l to l+1 (len L-1).
    k_upsamples[l]— upsample K from level l+1 to l (len L-1).
    n_src/n_tgt   — padded coarse src/tgt token counts (S, T).
    n_gt_matches  — padded GT coarse correspondence count.
    """
    n_points: Tuple[int, ...]
    k_neighbors: Tuple[int, ...]
    k_pools: Tuple[int, ...]
    k_upsamples: Tuple[int, ...]
    n_src: int
    n_tgt: int
    n_gt_matches: int

    @property
    def num_levels(self) -> int:
        return len(self.n_points)


class PairBatch(NamedTuple):
    """A batch of registration pairs, padded to a ShapeSpec. All jnp arrays."""

    # pyramid
    points: Tuple[jnp.ndarray, ...]      # L x [B, N_l, 3]
    masks: Tuple[jnp.ndarray, ...]       # L x [B, N_l] bool
    neighbors: Tuple[jnp.ndarray, ...]   # L x [B, N_l, K_l] int32 (sentinel N_l)
    pools: Tuple[jnp.ndarray, ...]       # (L-1) x [B, N_{l+1}, Kp_l] int32
    upsamples: Tuple[jnp.ndarray, ...]   # (L-1) x [B, N_l, Ku_l] int32
    features: jnp.ndarray                # [B, N_0, C_in]

    # coarse-level split (level = coarse_level)
    src_idx_coarse: jnp.ndarray          # [B, S] int32 into packed coarse array (sentinel N_c)
    tgt_idx_coarse: jnp.ndarray          # [B, T] int32
    src_mask: jnp.ndarray                # [B, S] bool
    tgt_mask: jnp.ndarray                # [B, T] bool

    # ground truth
    rot_gt: jnp.ndarray                  # [B, 3, 3]
    trn_gt: jnp.ndarray                  # [B, 3, 1]
    gt_src: jnp.ndarray                  # [B, G] int32 coarse GT match src indices
    gt_tgt: jnp.ndarray                  # [B, G] int32
    gt_valid: jnp.ndarray                # [B, G] bool
    coarse_flow: jnp.ndarray             # [B, S, 3] (zeros for rigid tasks)
    gt_cov: Optional[jnp.ndarray] = None # [B, 6, 6] Predator gt covariance (3DMatch RR)

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    def matrix_gt(self) -> jnp.ndarray:
        """Dense GT matching matrix [B, S, T] from padded index pairs.

        Equivalent of pipeline.py:199-202 (scatter ones at GT correspondences);
        invalid slots scatter out of bounds and are dropped.
        """
        import jax

        s = self.src_mask.shape[1]
        t = self.tgt_mask.shape[1]

        def one(src, tgt, valid):
            m = jnp.zeros((s, t), jnp.float32)
            src_c = jnp.where(valid, src, s)
            tgt_c = jnp.where(valid, tgt, t)
            return m.at[src_c, tgt_c].set(1.0, mode="drop")

        return jax.vmap(one)(self.gt_src, self.gt_tgt, self.gt_valid)


def pad_to(arr: np.ndarray, size: int, axis: int = 0, fill=0):
    """Pad ``arr`` with ``fill`` along ``axis`` up to ``size`` (host-side)."""
    pad = size - arr.shape[axis]
    if pad < 0:
        raise ValueError(f"bucket too small: have {arr.shape[axis]}, need <= {size}")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def stack_pairs(samples: Sequence[dict]) -> dict:
    """Stack a list of per-pair dicts of numpy arrays along a new batch axis."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if vals[0] is None:
            out[key] = None
        elif isinstance(vals[0], (list, tuple)):
            out[key] = tuple(np.stack([v[i] for v in vals]) for i in range(len(vals[0])))
        else:
            out[key] = np.stack(vals)
    return out
