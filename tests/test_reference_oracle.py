"""Reference-as-oracle numeric parity tests (VERDICT r4 #2).

torch (CPU) is installed in this environment and large parts of the
reference at /root/reference run on CPU without its CUDA extensions.
These tests import the reference modules directly — stubbing only its
GPU-only / absent deps (pykeops, torch_cluster, pytorch3d, torchvision,
trimesh, the removed ``imp`` module and the CUDA encoder packages) — and
assert weight-for-weight numeric agreement between the reference and
this framework:

- SMPL LBS forward           vs `third_parties/smpl/smpl_numpy.py:45-102`
- MotionBasisComputer        vs `core/utils/network_util.py:138-200`
- ConvDecoder3D mweight head vs `core/utils/network_util.py:12-50` under
                                converted weights
- hann-window embedder       vs `embedders/hannw_fourier.py:26-39`
- BodyPoseRefiner            vs `pose_decoders/mlp_delta_body_pose.py:35-41`
- _raw2outputs compositing   vs `core/nets/occnerf/network.py:320-348`
- simple_agg attention       vs `canonical_mlps/occnerf_mlp.py:86-126`
- body/camera host math      vs `core/utils/{body,camera}_util.py`
- train-dataset item contract vs `core/data/occnerf/train.py:353-537`
  (image mode exactly; patch mode with the reference's recorded RNG
  draws replayed into this framework's explicit-Generator sampler)

The reference packages are imported once per test module with
``/root/reference`` temporarily on sys.path (removed right after import
so the reference's root-level ``train/run/eval`` modules can never
shadow this repo's entry points for later tests).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import pickle
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


# ---------------------------------------------------------------------------
# dependency stubs (GPU-only / absent packages the reference imports at
# module level but which none of the tested CPU paths actually call)
# ---------------------------------------------------------------------------

def _load_source(name, path):
    """python<=3.11 imp.load_source on importlib machinery."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class _ToTensor:
    """torchvision semantics: HWC->CHW; scales only uint8 inputs."""

    def __call__(self, x):
        t = torch.from_numpy(np.ascontiguousarray(x))
        if t.ndim == 3:
            t = t.permute(2, 0, 1)
        if x.dtype == np.uint8:
            t = t.float().div(255.0)
        return t.contiguous()


class _Normalize:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, t):
        m = torch.tensor(self.mean, dtype=t.dtype).view(-1, 1, 1)
        s = torch.tensor(self.std, dtype=t.dtype).view(-1, 1, 1)
        return (t - m) / s


def _mk(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _build_stubs():
    tv = _mk("torchvision")
    tvt = _mk("torchvision.transforms", Compose=_Compose,
              ToTensor=_ToTensor, Normalize=_Normalize)
    tvm = _mk("torchvision.models")
    tv.transforms, tv.models = tvt, tvm
    pyk = _mk("pykeops")
    pykt = _mk("pykeops.torch", LazyTensor=object)
    pyk.torch = pykt
    p3d = _mk("pytorch3d")
    p3do = _mk("pytorch3d.ops")
    p3dn = _mk("pytorch3d.ops.points_normals",
               estimate_pointcloud_normals=None)
    p3d.ops, p3do.points_normals = p3do, p3dn
    tm = _mk("trimesh")
    tm.remesh = _mk("trimesh.remesh")

    class _FakeEncoder:
        def __init__(self, *a, **k):
            self.output_dim = 32

    skimage = _mk("skimage")
    skimage.data = _mk("skimage.data")

    stubs = {
        "imp": _mk("imp", load_source=_load_source),
        "skimage": skimage, "skimage.data": skimage.data,
        "torchvision": tv, "torchvision.transforms": tvt,
        "torchvision.models": tvm,
        "pykeops": pyk, "pykeops.torch": pykt,
        "pytorch3d": p3d, "pytorch3d.ops": p3do,
        "pytorch3d.ops.points_normals": p3dn,
        "torch_cluster": _mk("torch_cluster", fps=None),
        "trimesh": tm, "trimesh.remesh": tm.remesh,
        # the two CUDA encoder extension packages (instantiated lazily;
        # the tested CPU paths never call them)
        "core.nets.occnerf.gridencoder": _mk(
            "core.nets.occnerf.gridencoder", GridEncoder=_FakeEncoder),
        "core.nets.occnerf.shencoder": _mk(
            "core.nets.occnerf.shencoder", SHEncoder=_FakeEncoder),
    }
    return stubs


@pytest.fixture(scope="module")
def ref():
    """Import the reference packages once, CPU-only, stubs in place."""
    installed = {}
    for name, mod in _build_stubs().items():
        if name not in sys.modules:
            sys.modules[name] = mod
            installed[name] = mod

    old_argv, old_cwd = sys.argv[:], os.getcwd()
    old_devcount = torch.cuda.device_count
    # the reference's import-time GPU probe requires >= 1 device to
    # populate cfg.primary_gpus (`configs/config.py:36-50`)
    torch.cuda.device_count = lambda: 1
    sys.argv = ["oracle", "--cfg",
                "configs/occnerf/zju_mocap/387/occnerf.yaml"]
    sys.path.insert(0, REF_ROOT)
    os.chdir(REF_ROOT)
    try:
        import configs as ref_configs  # argparse + yacs merge side-effect
        from core.utils import body_util, camera_util, network_util
        from core.data.occnerf import occlude as ref_occlude
        from core.data.occnerf import train as ref_train_mod
        from core.nets.occnerf import network as ref_network_mod
        from core.nets.occnerf.embedders import hannw_fourier
        from core.nets.occnerf.mweight_vol_decoders import \
            deconv_vol_decoder
        from core.nets.occnerf.pose_decoders import mlp_delta_body_pose
        from core.nets.occnerf.canonical_mlps import occnerf_mlp
        from third_parties.smpl import smpl_numpy
    finally:
        os.chdir(old_cwd)
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        sys.argv = old_argv
        torch.cuda.device_count = old_devcount

    yield SimpleNamespace(
        cfg=ref_configs.cfg, body_util=body_util, camera_util=camera_util,
        network_util=network_util, train_mod=ref_train_mod,
        network_mod=ref_network_mod, hannw=hannw_fourier,
        deconv=deconv_vol_decoder, pose_dec=mlp_delta_body_pose,
        occ_mlp=occnerf_mlp, smpl=smpl_numpy, occlude=ref_occlude)

    for name in installed:
        sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# shared synthetic assets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def smpl_6890(tmp_path_factory):
    """A synthetic SMPL model at the reference's hardcoded geometry
    (6890 verts / 24 joints / 10 betas / 207 posedirs), written in the
    reference's expected on-disk shape (sparse J_regressor)."""
    from scipy import sparse

    from occnerf_tpu.smpl.model import synthetic_smpl_model

    model = synthetic_smpl_model(n_verts=6890, seed=3)
    ref_model = dict(model)
    ref_model["J_regressor"] = sparse.csr_matrix(model["J_regressor"])

    d = tmp_path_factory.mktemp("smpl") / "third_parties" / "smpl" / "models"
    d.mkdir(parents=True)
    path = d / "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"
    with open(path, "wb") as f:
        pickle.dump(ref_model, f)
    return {"model": model, "ref_pkl": str(path),
            "cwd": str(d.parent.parent.parent)}


# ---------------------------------------------------------------------------
# 1. SMPL LBS forward
# ---------------------------------------------------------------------------

def test_smpl_forward_matches_reference(ref, smpl_6890):
    from occnerf_tpu.smpl.model import SMPL as MySMPL

    ref_smpl = ref.smpl.SMPL(
        sex="neutral",
        model_dir=os.path.dirname(smpl_6890["ref_pkl"]))
    my_smpl = MySMPL(model_path=smpl_6890["ref_pkl"])

    rng = np.random.default_rng(0)
    for trial in range(3):
        pose = rng.normal(0, 0.3, 72).astype(np.float32)
        beta = rng.normal(0, 0.5, 10).astype(np.float32)
        trans = (rng.normal(0, 0.1, 3).astype(np.float32)
                 if trial == 2 else None)
        v_ref, j_ref = ref_smpl(pose, beta, trans=trans)
        v_my, j_my = my_smpl(pose, beta, trans=trans)
        np.testing.assert_allclose(v_my, v_ref, rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(j_my, j_ref, rtol=1e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# 2. MotionBasisComputer
# ---------------------------------------------------------------------------

def test_motion_basis_matches_reference(ref):
    from occnerf_tpu.models.motion import motion_basis
    from occnerf_tpu.utils.body import (get_canonical_global_tfms,
                                        rodrigues)

    rng = np.random.default_rng(1)
    dst_Rs = rodrigues(rng.normal(0, 0.4, (24, 3))).astype(np.float32)
    dst_Ts = rng.normal(0, 0.2, (24, 3)).astype(np.float32)
    joints = np.cumsum(rng.normal(0, 0.1, (24, 3)), axis=0).astype(
        np.float32)
    cnl_gtfms = get_canonical_global_tfms(joints).astype(np.float32)

    comp = ref.network_util.MotionBasisComputer(total_bones=24)
    sR_ref, T_ref = comp(torch.from_numpy(dst_Rs)[None],
                         torch.from_numpy(dst_Ts)[None],
                         torch.from_numpy(cnl_gtfms)[None])

    sR_my, T_my = motion_basis(dst_Rs, dst_Ts, cnl_gtfms)
    np.testing.assert_allclose(np.asarray(sR_my), sR_ref[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_my), T_ref[0].numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 3. ConvDecoder3D / deconv motion-weight decoder under converted weights
# ---------------------------------------------------------------------------

def test_deconv_mweight_decoder_matches_reference(ref):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), os.pardir))
    from occnerf_tpu.models.mweight import DeconvVolumeDecoder
    from tools.convert_reference_checkpoint import convert_state_dict

    torch.manual_seed(0)
    ref_dec = ref.deconv.MotionWeightVolumeDecoder(
        embedding_size=256, volume_size=32, total_bones=24)
    sd = {f"mweight_vol_decoder.{k}": v.detach().numpy()
          for k, v in ref_dec.state_dict().items()}
    params, _ = convert_state_dict(sd)

    rng = np.random.default_rng(2)
    priors = rng.random((1, 25, 32, 32, 32)).astype(np.float32) + 0.05
    priors /= priors.sum(axis=1, keepdims=True)

    with torch.no_grad():
        out_ref = ref_dec(torch.from_numpy(priors)).numpy()

    my_dec = DeconvVolumeDecoder(embedding_size=256, volume_size=32,
                                 total_bones=24)
    out_my = np.asarray(my_dec.apply(params["mweight_vol_decoder"],
                                     priors))
    np.testing.assert_allclose(out_my, out_ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 4. hann-window embedder
# ---------------------------------------------------------------------------

def test_hannw_embedder_matches_reference(ref):
    from occnerf_tpu.models.embedders import hannw_fourier_embed

    kick_in, full_band = 1000, 50000
    ref.cfg.non_rigid_motion_mlp.kick_in_iter = kick_in
    ref.cfg.non_rigid_motion_mlp.full_band_iter = full_band

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (17, 3)).astype(np.float32)
    multires = 6
    for iter_val in [0.0, 999.0, 1000.0, 7355.0, 25000.0, 60000.0]:
        embed_fn, out_dim = ref.hannw.get_embedder(
            multires, torch.tensor(float(iter_val)))
        out_ref = embed_fn(torch.from_numpy(x)).numpy()
        assert out_ref.shape[-1] == out_dim

        out_my = np.asarray(hannw_fourier_embed(
            x, multires, iter_val, kick_in, full_band))
        np.testing.assert_allclose(out_my, out_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 5. BodyPoseRefiner under converted weights
# ---------------------------------------------------------------------------

def test_pose_refiner_matches_reference(ref):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), os.pardir))
    from occnerf_tpu.models.pose_refiner import BodyPoseRefiner
    from tools.convert_reference_checkpoint import convert_state_dict

    torch.manual_seed(1)
    ref_dec = ref.pose_dec.BodyPoseRefiner(
        embedding_size=69, mlp_width=256, mlp_depth=4)

    rng = np.random.default_rng(4)
    posevec = rng.normal(0, 0.3, (1, 69)).astype(np.float32)

    for scale_last in (False, True):
        if scale_last:
            # re-randomize the near-identity last layer to exercise
            # non-trivial Rodrigues rotations too
            with torch.no_grad():
                ref_dec.block_mlps[-1].weight.uniform_(-0.05, 0.05)
                ref_dec.block_mlps[-1].bias.uniform_(-0.02, 0.02)
        sd = {f"pose_decoder.{k}": v.detach().numpy()
              for k, v in ref_dec.state_dict().items()}
        params, _ = convert_state_dict(sd)

        with torch.no_grad():
            Rs_ref = ref_dec(torch.from_numpy(posevec))["Rs"].numpy()

        my_dec = BodyPoseRefiner(embedding_size=69, mlp_width=256,
                                 mlp_depth=4, total_bones=24)
        Rs_my = np.asarray(my_dec.apply(params["pose_decoder"],
                                        posevec)["Rs"])
        np.testing.assert_allclose(Rs_my, Rs_ref, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# 6. _raw2outputs volume compositing
# ---------------------------------------------------------------------------

def test_raw2outputs_matches_reference(ref):
    from occnerf_tpu.ops.raymarch import raw2outputs

    rng = np.random.default_rng(5)
    N, S = 11, 32
    raw = rng.normal(0, 2, (N, S, 4)).astype(np.float32)
    raw_mask = (rng.random((N, S, 1)) > 0.3).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 4.0, (N, S)).astype(np.float32), axis=1)
    rays_d = rng.normal(0, 1, (N, 3)).astype(np.float32)
    bg = np.array([12.0, 200.0, 77.0], np.float32)

    rgb_ref, acc_ref, w_ref, depth_ref, term_ref = \
        ref.network_mod.Network._raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(raw_mask),
            torch.from_numpy(z), torch.from_numpy(rays_d),
            torch.from_numpy(bg))

    out = raw2outputs(raw, raw_mask, z, rays_d, bg)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc), acc_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), w_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.term_idx),
                                  term_ref.numpy()[:, 0])


# ---------------------------------------------------------------------------
# 7. simple_agg visibility-attention aggregation
# ---------------------------------------------------------------------------

def test_simple_agg_matches_reference(ref):
    from occnerf_tpu.models.canonical import OccNeRFCanonicalMLP

    rng = np.random.default_rng(6)
    N, K, C = 9, 40, 35
    atts = rng.uniform(0, 30, (N, K, 1)).astype(np.float32)
    feats = rng.normal(0, 1, (N, K, C)).astype(np.float32)

    agg_ref, var_ref = ref.occ_mlp.CanonicalMLP.simple_agg(
        None, torch.from_numpy(atts.copy()), torch.from_numpy(feats))

    my = OccNeRFCanonicalMLP.__new__(OccNeRFCanonicalMLP)
    agg_my, var_my = my.simple_agg(atts[..., 0], feats)
    np.testing.assert_allclose(np.asarray(agg_my), agg_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_my), var_ref.numpy(),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# 8. host math: body_util / camera_util
# ---------------------------------------------------------------------------

def test_body_util_matches_reference(ref):
    from occnerf_tpu.utils import body as my_body

    rng = np.random.default_rng(7)
    joints = np.cumsum(rng.normal(0, 0.1, (24, 3)), axis=0).astype(
        np.float32)
    poses = rng.normal(0, 0.4, 72).astype(np.float32)

    Rs_ref, Ts_ref = ref.body_util.body_pose_to_body_RTs(poses, joints)
    Rs_my, Ts_my = my_body.body_pose_to_body_RTs(poses, joints)
    np.testing.assert_allclose(Rs_my, Rs_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Ts_my, Ts_ref, rtol=1e-5, atol=1e-6)

    g_ref = ref.body_util.get_canonical_global_tfms(joints)
    g_my = my_body.get_canonical_global_tfms(joints)
    np.testing.assert_allclose(g_my, g_ref, rtol=1e-5, atol=1e-6)

    bmin = joints.min(0) - 0.3
    bmax = joints.max(0) + 0.3
    vol_ref = ref.body_util.approx_gaussian_bone_volumes(
        joints, bmin, bmax, grid_size=32)
    vol_my = my_body.approx_gaussian_bone_volumes(
        joints, bmin, bmax, grid_size=32)
    np.testing.assert_allclose(vol_my, vol_ref, rtol=1e-4, atol=1e-6)


def test_camera_util_matches_reference(ref):
    from occnerf_tpu.utils import camera as my_cam

    rng = np.random.default_rng(8)
    H, W = 40, 52
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    campos = np.array([0.3, -0.2, 2.5], np.float32)
    R = my_cam.get_camrot(campos, np.zeros(3, np.float32))
    R_ref = ref.camera_util.get_camrot(campos, np.zeros(3, np.float32))
    np.testing.assert_allclose(R, R_ref, rtol=1e-6, atol=1e-7)

    E = np.eye(4)
    E[:3, :3], E[:3, 3] = R, -R @ campos
    Rh = rng.normal(0, 0.2, 3).astype(np.float32)
    Th = rng.normal(0, 0.1, 3).astype(np.float32)
    E_ref = ref.camera_util.apply_global_tfm_to_camera(E, Rh, Th)
    E_my = my_cam.apply_global_tfm_to_camera(E, Rh, Th)
    np.testing.assert_allclose(E_my, E_ref, rtol=1e-6, atol=1e-7)

    ro_ref, rd_ref = ref.camera_util.get_rays_from_KRT(
        H, W, K, E_ref[:3, :3], E_ref[:3, 3])
    ro_my, rd_my = my_cam.get_rays_from_KRT(
        H, W, K, E_my[:3, :3], E_my[:3, 3])
    np.testing.assert_allclose(ro_my, ro_ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(rd_my, rd_ref, rtol=1e-6, atol=1e-7)

    bounds = {"min_xyz": np.array([-0.6, -0.9, -0.5]),
              "max_xyz": np.array([0.7, 0.8, 0.6])}
    near_ref, far_ref, mask_ref = ref.camera_util.rays_intersect_3d_bbox(
        bounds, ro_ref.reshape(-1, 3), rd_ref.reshape(-1, 3))
    near_my, far_my, mask_my = my_cam.rays_intersect_3d_bbox(
        bounds, ro_my.reshape(-1, 3), rd_my.reshape(-1, 3))
    np.testing.assert_array_equal(mask_my, mask_ref)
    np.testing.assert_allclose(near_my, near_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(far_my, far_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 9/10. train-dataset item contract
# ---------------------------------------------------------------------------

_KEYFILTER = ["rays", "target_rgbs", "motion_bases",
              "motion_weights_priors", "cnl_bbox", "dst_posevec_69"]


@pytest.fixture(scope="module")
def subject_6890(tmp_path_factory, smpl_6890):
    from occnerf_tpu.data.synthetic import make_synthetic_subject

    d = tmp_path_factory.mktemp("subject")
    path = make_synthetic_subject(
        str(d / "subj"), n_frames=2, img_size=128, n_verts=6890, seed=5,
        model_path=smpl_6890["ref_pkl"])
    return path


def _config_both(ref, subject_path):
    """Point the reference cfg and this framework's cfg at the same
    subject with identical knobs."""
    from occnerf_tpu.config import cfg as my_cfg

    for c in (ref.cfg,):
        c.bbox_offset = 0.3
        c.resize_img_scale = 0.5
        c.occlude = True
        c.occlusion.mid = 40
        c.occlusion.width = 24
        c.occlusion.range = 1
        c.include_img = True
        c.patch.N_patches = 4
        c.patch.size = 16
        c.patch.sample_subject_ratio = 0.8

    my_cfg.bbox_offset = 0.3
    my_cfg.resize_img_scale = 0.5
    my_cfg.occlude = True
    my_cfg.occlusion.mid = 40
    my_cfg.occlusion.width = 24
    my_cfg.occlusion.range = 1
    my_cfg.include_img = True
    my_cfg.patch.N_patches = 4
    my_cfg.patch.size = 16
    my_cfg.patch.sample_subject_ratio = 0.8
    my_cfg.smpl_model_dir = os.path.join("third_parties", "smpl", "models")
    return my_cfg


def _common_field_checks(mine, theirs):
    np.testing.assert_allclose(mine["poses"], theirs["poses"], atol=0)
    np.testing.assert_allclose(mine["betas"], theirs["betas"], atol=0)
    np.testing.assert_allclose(mine["Rh"], theirs["Rh"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mine["Th"], theirs["Th"], atol=0)
    np.testing.assert_allclose(mine["joints"], theirs["joints"], atol=0)
    np.testing.assert_allclose(mine["dst_Rs"], theirs["dst_Rs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mine["dst_Ts"], theirs["dst_Ts"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mine["cnl_gtfms"], theirs["cnl_gtfms"],
                               rtol=1e-5, atol=1e-6)
    # Gaussian-tail denormals in the bone prior normalize with different
    # fp32 rounding (3 / 819200 elements past rtol 1e-5 on this subject);
    # the direct unit test (test_body_util_matches_reference) pins the
    # same function at rtol 1e-4 on shared inputs.
    np.testing.assert_allclose(mine["motion_weights_priors"],
                               theirs["motion_weights_priors"],
                               rtol=1e-3, atol=1e-6)
    for k in ("cnl_bbox_min_xyz", "cnl_bbox_max_xyz",
              "cnl_bbox_scale_xyz"):
        np.testing.assert_allclose(mine[k], theirs[k], atol=0)
    np.testing.assert_allclose(mine["dst_posevec"], theirs["dst_posevec"],
                               atol=0)
    np.testing.assert_allclose(mine["bgcolor"], theirs["bgcolor"], atol=0)
    assert mine["img_width"] == theirs["img_width"]
    assert mine["img_height"] == theirs["img_height"]
    # ImageNet-normalized image + alpha (include_img block)
    np.testing.assert_allclose(np.asarray(mine["img"]),
                               theirs["img"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mine["alpha"], theirs["alpha"],
                               rtol=1e-5, atol=1e-6)


def test_train_dataset_image_mode_matches_reference(
        ref, subject_6890, smpl_6890):
    from occnerf_tpu.data.train import Dataset as MyDataset

    _config_both(ref, subject_6890)
    bg = [15.0, 120.0, 240.0]

    old_cwd = os.getcwd()
    os.chdir(smpl_6890["cwd"])  # reference resolves its SMPL pkl from cwd
    try:
        ref_ds = ref.train_mod.Dataset(
            subject_6890, keyfilter=_KEYFILTER, bgcolor=bg,
            ray_shoot_mode="image", skip=1)
        my_ds = MyDataset(
            subject_6890, keyfilter=_KEYFILTER + ["verts"], bgcolor=bg,
            ray_shoot_mode="image", skip=1, occlude=True)

        for idx in range(2):
            theirs = ref_ds[idx]
            mine = my_ds[idx]

            _common_field_checks(mine, theirs)
            np.testing.assert_allclose(mine["verts"], theirs["verts"],
                                       rtol=1e-4, atol=5e-5)

            mask_ref = theirs["ray_mask"]
            np.testing.assert_array_equal(mine["ray_mask"], mask_ref)
            n = int(mask_ref.sum())
            assert int(mine["n_valid_rays"]) == n
            assert n > 50  # the synthetic subject must actually be seen
            np.testing.assert_allclose(mine["rays"][:, :n],
                                       theirs["rays"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["near"][:n], theirs["near"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["far"][:n], theirs["far"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["target_rgbs"][:n],
                                       theirs["target_rgbs"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["ray_alpha"][:n],
                                       theirs["ray_alpha"],
                                       rtol=1e-5, atol=1e-6)
            # padded tail must be inert
            assert np.all(mine["ray_valid"][:n] == 1.0)
            assert np.all(mine["ray_valid"][n:] == 0.0)
            assert np.all(mine["far"][n:] == 0.0)
    finally:
        os.chdir(old_cwd)


class _ReplayRng:
    """np.random.Generator facade replaying the reference's recorded
    global-RNG draws (one rand + one choice per patch)."""

    def __init__(self, rands, choices):
        self.rands = list(rands)
        self.choices = list(choices)

    def random(self, *a, **k):
        return self.rands.pop(0)

    def integers(self, lo, hi=None, *a, **k):
        return self.choices.pop(0)


def test_train_dataset_patch_mode_matches_reference(
        ref, subject_6890, smpl_6890):
    from occnerf_tpu.data.train import Dataset as MyDataset

    _config_both(ref, subject_6890)
    bg = [255.0, 255.0, 255.0]

    old_cwd = os.getcwd()
    os.chdir(smpl_6890["cwd"])
    try:
        ref_ds = ref.train_mod.Dataset(
            subject_6890, keyfilter=_KEYFILTER, bgcolor=bg,
            ray_shoot_mode="patch", skip=1)
        my_ds = MyDataset(
            subject_6890, keyfilter=_KEYFILTER, bgcolor=bg,
            ray_shoot_mode="patch", skip=1, occlude=True)

        # record the reference's patch-placement draws
        rands, choices = [], []
        orig_rand, orig_choice = np.random.rand, np.random.choice

        def rec_rand(*a, **k):
            out = orig_rand(*a, **k)
            rands.append(float(out[0]) if a else float(out))
            return out

        def rec_choice(n, *a, **k):
            out = orig_choice(n, *a, **k)
            choices.append(int(np.asarray(out).reshape(-1)[0]))
            return out

        np.random.rand, np.random.choice = rec_rand, rec_choice
        try:
            np.random.seed(11)
            theirs = ref_ds[1]  # frame 1: no occlusion band
        finally:
            np.random.rand, np.random.choice = orig_rand, orig_choice

        P = ref.cfg.patch.size
        n_p = ref.cfg.patch.N_patches
        assert len(rands) == n_p and len(choices) == n_p

        my_ds.rng = _ReplayRng(rands, choices)
        mine = my_ds[1]

        _common_field_checks(mine, theirs)

        np.testing.assert_array_equal(mine["patch_masks"],
                                      theirs["patch_masks"])
        np.testing.assert_allclose(mine["target_patches"],
                                   theirs["target_patches"],
                                   rtol=1e-5, atol=1e-6)

        counts = mine["patch_masks"].reshape(n_p, -1).sum(1)
        div = np.concatenate([[0], np.cumsum(counts)])
        np.testing.assert_array_equal(div, theirs["patch_div_indices"])

        # rays/near/far at the in-bbox positions of each patch window
        # must equal the reference's variable-length selection
        for i in range(n_p):
            m = mine["patch_masks"][i].reshape(-1)
            blk = slice(i * P * P, (i + 1) * P * P)
            seg = slice(int(div[i]), int(div[i + 1]))
            np.testing.assert_allclose(mine["rays"][:, blk][:, m],
                                       theirs["rays"][:, seg],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["near"][blk][m],
                                       theirs["near"][seg],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mine["far"][blk][m],
                                       theirs["far"][seg],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(
                mine["ray_valid"][blk], m.astype(np.float32))
    finally:
        os.chdir(old_cwd)


# ---------------------------------------------------------------------------
# 11. occluder compositor (dormant utility, active-path semantics)
# ---------------------------------------------------------------------------

def test_occlude_compositor_matches_reference(ref):
    from occnerf_tpu.data import occlude as my_occ

    rng = np.random.default_rng(12)

    # resize_by_factor: bilinear up / area down
    im = rng.integers(0, 255, (21, 17, 4)).astype(np.uint8)
    for factor in (0.4, 1.0, 2.3):
        np.testing.assert_array_equal(
            my_occ.resize_by_factor(im, factor),
            ref.occlude.resize_by_factor(im, factor))

    # paste_over, mask on/off, RGBA and RGB sources, border clipping
    for mask in (False, True):
        for center in ((15.0, 20.0), (2.0, 2.0), (38.0, 29.0)):
            for ch in (4, 3):
                src = rng.integers(0, 255, (9, 11, ch)).astype(np.uint8)
                dst_ref = rng.integers(0, 255, (30, 40, 3)).astype(
                    np.uint8)
                dst_my = dst_ref.copy()
                ref.occlude.paste_over(src.copy(), dst_ref,
                                       np.array(center), mask=mask)
                my_occ.paste_over(src.copy(), dst_my,
                                  np.array(center), mask=mask)
                np.testing.assert_array_equal(dst_my, dst_ref)

    # occlude_with_objects (active path: every occluder at `joints`,
    # whitened cutout) vs occlude_at_joints
    occluders = [rng.integers(0, 255, (12, 9, 4)).astype(np.uint8)
                 for _ in range(3)]
    im = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    joints = np.array([25.0, 18.0])
    out_ref = ref.occlude.occlude_with_objects(
        im.copy(), [o.copy() for o in occluders], multiplier=1.4,
        joints=joints, mask=True)
    out_my = my_occ.occlude_at_joints(
        im.copy(), [o.copy() for o in occluders], multiplier=1.4,
        joints=joints, mask=True)
    np.testing.assert_array_equal(out_my, out_ref)
