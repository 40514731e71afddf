"""Load the reference MATR2D3D (Diff-Reg-2d3d) offline for parity tests.

The experiment model imports a wide third-party surface that is partly
absent here (open3d, skimage, loguru, easydict, pykeops, torchvision) and
constructs two pretrained towers (DINOv2 via torch hub, DepthAnything via
huggingface). For the TRAINABLE-path parity tests none of that is needed:

  * absent third-party modules get import-level stubs;
  * the KeOps knn kernel is replaced with an exact torch cdist+topk
    (vision3d/ops/knn.py:10-28 semantics, same ordering);
  * the towers are replaced by injectable fixtures: the dummy encoder
    returns a FIXED dino feature map and ``predict_depth`` returns a FIXED
    monocular depth map — the same arrays are fed to our pipeline;
  * ``vision3d.ext`` (compiled C++) is stubbed; nothing on the trainable
    path calls it.

Also provides ``sample_to_reference_data_2d3d``: converts one of OUR padded
2D-3D samples (data/collate2d3d.py) into the reference's pack-mode
data_dict so both models consume literally identical pyramids.
"""
from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np

REF2D3D_ROOT = "/root/reference/Diff-Reg-2d3d"
EXP_DIR = os.path.join(
    REF2D3D_ROOT, "experiments", "2d3dmatr.rgbdv2.stage4.level3.stage1")

_EXPERIMENT_MODULES = (
    "model", "config", "dataset", "utils", "matching", "procrustes",
    "fusion_module", "image_backbone", "point_backbone", "encoders", "loss",
    "vision3d", "depth_anything", "transformer", "ops", "torchhub",
)


def _purge():
    for mod in list(sys.modules):
        if mod.split(".")[0] in _EXPERIMENT_MODULES:
            del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if not p.startswith("/root/reference")]


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    import torch

    # open3d: the KPConv layer reads its kernel dispositions ply through
    # o3d.io (vision3d/layers/kpconv_utils/kernel_points.py:423); back it
    # with our own PLY reader so the layer gets the REAL shipped dispositions
    o3d = _stub_module("open3d")

    class _Pcd:
        def __init__(self, points):
            self.points = points

    def _read_point_cloud(path):
        from diffreg_tpu.utils.ply import read_ply

        d = read_ply(path)
        return _Pcd(np.stack([d["x"], d["y"], d["z"]], axis=1))

    o3d.io = _stub_module("open3d.io", read_point_cloud=_read_point_cloud,
                          write_point_cloud=lambda *a, **k: None)
    skim = _stub_module("skimage")
    skim.io = _stub_module("skimage.io")

    class _Loguru(types.ModuleType):
        def __getattr__(self, name):
            return lambda *a, **k: None

    logger = _Loguru("loguru.logger")
    _stub_module("loguru", logger=logger)

    ed = _stub_module("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                setattr(self, k, v)

        def __setattr__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setattr__(k, v)
            self[k] = v

        __getattr__ = dict.__getitem__

    ed.EasyDict = EasyDict

    pk = _stub_module("pykeops")
    pkt = _stub_module("pykeops.torch")
    pkt.LazyTensor = None  # never constructed: keops_knn is replaced below
    pk.torch = pkt

    # torchvision: only reached through encoders.py, which is replaced by a
    # dummy module entirely (the encoder IS the stub), but vision3d.utils
    # imports it in some paths — make import succeed
    tv = _stub_module("torchvision")
    tv.models = _stub_module("torchvision.models")
    tv.transforms = _stub_module("torchvision.transforms")
    tv.transforms.Compose = lambda fns: (lambda x: x)

    _stub_module("ipdb", set_trace=lambda *a, **k: None)

    # vision3d.ext: compiled C++; nothing on the trainable path uses it
    class _ExtStub(types.ModuleType):
        def __getattr__(self, name):
            def _unavailable(*a, **k):
                raise RuntimeError(f"vision3d.ext.{name} stubbed (not on path)")

            return _unavailable

    sys.modules["vision3d.ext"] = _ExtStub("vision3d.ext")


class _DummyEncoder:
    """Stands in for CNNandDinov2: returns the injected dino feature map."""

    dino_chw = None  # set by the test: np [1, C, h14, w14]

    def __init__(self, *a, **k):
        pass

    def __call__(self, image_ext):
        import torch

        assert _DummyEncoder.dino_chw is not None, "set reference_utils2d3d.set_tower_fixtures first"
        return {16: torch.from_numpy(_DummyEncoder.dino_chw)}

    def eval(self):
        return self


class _DummyDepthModel:
    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls()

    def to(self, device):
        return self

    def eval(self):
        return self


_FIXTURES = {"depth": None}


def set_tower_fixtures(dino_hwc: np.ndarray, mono_depth_hw: np.ndarray):
    """dino_hwc: [1, h14, w14, C] (our layout); mono_depth_hw: [H, W].

    The reference consumes the dino map channel-first and the RAW
    DepthAnything output (it divides by 100 itself, model.py:349)."""
    _DummyEncoder.dino_chw = np.ascontiguousarray(
        dino_hwc.transpose(0, 3, 1, 2).astype(np.float32))
    _FIXTURES["depth"] = mono_depth_hw.astype(np.float32)


def load_reference_matr2d3d(sample_step: int = 2, workdir: str = "/tmp/ref2d3d_work"):
    """Instantiate the reference MATR2D3D with stubbed towers. Returns
    (model, cfg, model_module)."""
    import torch

    _purge()
    _install_stubs()

    # fake tower modules BEFORE the experiment imports them
    enc = _stub_module("encoders")
    enc.CNNandDinov2 = _DummyEncoder
    da = _stub_module("depth_anything")
    dpt = _stub_module("depth_anything.dpt")
    dpt.DepthAnything = _DummyDepthModel
    da.dpt = dpt
    dau = _stub_module("depth_anything.util")

    class _Passthrough:
        def __init__(self, *a, **k):
            pass

        def __call__(self, sample):
            return sample

    dat = _stub_module("depth_anything.util.transform",
                       Resize=_Passthrough, NormalizeImage=_Passthrough,
                       PrepareForNet=_Passthrough)
    dau.transform = dat

    sys.path.insert(0, REF2D3D_ROOT)
    sys.path.insert(0, EXP_DIR)

    # exact torch replacement for the KeOps knn kernel (same output
    # contract). NOTE: `vision3d.ops.knn` the ATTRIBUTE is the re-exported
    # function (shadowed by `from .knn import knn` in ops/__init__), so the
    # real module must come from sys.modules.
    import vision3d.ops  # noqa: F401  (loads the submodules)

    knn_mod = sys.modules["vision3d.ops.knn"]

    def keops_knn_torch(q_points, s_points, k):
        d = torch.cdist(q_points, s_points)
        knn_d, knn_i = d.topk(k, dim=-1, largest=False)
        return knn_d, knn_i

    knn_mod.keops_knn = keops_knn_torch

    # config.py creates output dirs relative to cwd — keep them out of the
    # read-only reference tree
    os.makedirs(workdir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        import config as ref_config

        cfg = ref_config.make_cfg()
    finally:
        os.chdir(cwd)
    cfg.model.coarse_matching.SAMPLE_STEP = sample_step

    torch.manual_seed(0)
    import model as ref_model_mod

    # silence CUDA-only calls on the CPU build
    ref_model_mod.torch.cuda.synchronize = lambda *a, **k: None

    def predict_depth_fixture(model, image):
        assert _FIXTURES["depth"] is not None
        return torch.from_numpy(_FIXTURES["depth"]).unsqueeze(0)

    ref_model_mod.predict_depth = predict_depth_fixture

    # get_correspondences is the open3d KD-tree GT helper (utils.py:47
    # import); replace with an exact scipy equivalent returning the same
    # (N, 2) torch long pairs
    from scipy.spatial import cKDTree

    def get_correspondences_scipy(src_pcd_o3d, tgt_pcd_o3d, trans, search_voxel_size, K=None):
        src = np.asarray(src_pcd_o3d)
        tgt = np.asarray(tgt_pcd_o3d)
        src_t = src @ trans[:3, :3].T + trans[:3, 3]
        tree = cKDTree(tgt)
        pairs = []
        for i, p in enumerate(src_t):
            for j in tree.query_ball_point(p, search_voxel_size):
                pairs.append((i, j))
        return torch.from_numpy(np.asarray(pairs, np.int64).reshape(-1, 2))

    ref_model_mod.get_correspondences = get_correspondences_scipy
    ref_model_mod.to_o3d_pcd = lambda x: (x.cpu().numpy() if hasattr(x, "cpu") else np.asarray(x))

    model = ref_model_mod.MATR2D3D(cfg).eval()
    return model, cfg, ref_model_mod


@contextlib.contextmanager
def torch_cpu_cuda_patch():
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def sample_to_reference_data_2d3d(sample: dict, raw: dict) -> dict:
    """Convert one padded 2D-3D sample (data/collate2d3d.build_2d3d_sample)
    + its raw dict into the reference pack-mode data_dict
    (GraphPyramid2D3DRegistrationCollateFn schema at batch_size 1).

    The point-backbone encoder uses stages 0-2 and ``points[-2]`` must be
    the coarse stage, so a 4th pyramid level is appended (its tables are
    dead: encoder4 is commented out in the reference, point_backbone.py).
    """
    import torch

    from diffreg_tpu.data.native import grid_subsample_native

    n_real = [int(m.sum()) for m in sample["masks"]]

    def remap(arr_rows, n_rows, n_support):
        a = np.asarray(arr_rows[:n_rows], np.int64)
        return torch.from_numpy(np.where(a >= n_support, n_support, a))

    pts = [torch.from_numpy(np.ascontiguousarray(
        sample["points"][l][: n_real[l]], np.float32)) for l in range(3)]
    # dead 4th stage: points[-2] indexing only needs the LIST length
    lvl3 = grid_subsample_native(np.asarray(pts[2]), 0.2).astype(np.float32)
    pts.append(torch.from_numpy(lvl3))

    neighbors = [remap(sample["neighbors"][l], n_real[l], n_real[l]) for l in range(3)]
    neighbors.append(torch.zeros((len(lvl3), 1), dtype=torch.long))
    subsampling = [remap(sample["pools"][l], n_real[l + 1], n_real[l]) for l in range(2)]
    subsampling.append(torch.zeros((len(lvl3), 1), dtype=torch.long))
    upsampling = [remap(sample["upsamples"][l], n_real[l], n_real[l + 1]) for l in range(2)]
    upsampling.append(torch.zeros((n_real[2], 1), dtype=torch.long))

    image = np.asarray(raw["image"], np.float32)           # [H, W, 3]
    image_gray = np.asarray(raw["image_gray"], np.float32) # [H, W]
    # the reference dataset carries depth in MILLIMETERS and back_project
    # divides by 1000 (vision3d/ops/back_project.py:40); our readers convert
    # to meters at load (data/datasets2d3d.py read_depth_image)
    depth = np.asarray(raw["depth"], np.float32) * 1000.0

    data = {
        "batch_size": 1,
        "image": torch.from_numpy(image[None]),            # (1, H, W, 3)
        "ori_image": torch.from_numpy(image[None]),
        "image_gray": torch.from_numpy(image_gray[None]),  # (1, H, W)
        "depth": torch.from_numpy(depth[None]),            # (1, H, W)
        "intrinsics": torch.from_numpy(np.asarray(raw["intrinsics"], np.float32)),
        "transform": torch.from_numpy(np.asarray(raw["transform"], np.float32)),
        "feats": torch.ones(n_real[0], 1),
        "points": pts,
        "neighbors": neighbors,
        "subsampling": subsampling,
        "upsampling": upsampling,
    }
    return data
