import numpy as np
import pytest

from occnerf_tpu.utils import body, camera, mesh
from occnerf_tpu.smpl import SMPL, synthetic_smpl_model, save_model


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def test_rodrigues_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(20):
        rvec = rng.normal(0, 1.0, 3)
        R_ref = cv2.Rodrigues(rvec)[0]
        R_ours = camera._exact_rodrigues(rvec)
        np.testing.assert_allclose(R_ours, R_ref, atol=1e-6)
        # the body-util variant uses theta+eps normalisation; looser tol
        R_body = body.rodrigues(rvec[None])[0]
        np.testing.assert_allclose(R_body, R_ref, atol=1e-3)


def test_rodrigues_zero_is_identity():
    np.testing.assert_allclose(
        camera._exact_rodrigues(np.zeros(3)), np.eye(3), atol=1e-7)


def test_rotation_between_aligns_vectors(rng):
    v1 = rng.normal(size=(16, 3))
    v2 = rng.normal(size=(16, 3))
    Rs = body.rotation_between(v1, v2)
    u1 = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
    u2 = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    aligned = np.einsum("nij,nj->ni", Rs, u1)
    np.testing.assert_allclose(aligned, u2, atol=1e-4)


# ---------------------------------------------------------------------------
# body RTs / canonical transforms / bone volumes
# ---------------------------------------------------------------------------

def _rest_joints(rng):
    joints = np.zeros((24, 3), dtype=np.float32)
    for i in range(1, 24):
        joints[i] = joints[body.SMPL_PARENT[i]] + rng.normal(0, 0.1, 3)
    return joints


def test_body_pose_to_body_RTs_zero_pose(rng):
    tpose = _rest_joints(rng)
    Rs, Ts = body.body_pose_to_body_RTs(np.zeros(72), tpose)
    assert Rs.shape == (24, 3, 3) and Ts.shape == (24, 3)
    np.testing.assert_allclose(Rs, np.broadcast_to(np.eye(3), (24, 3, 3)),
                               atol=1e-4)
    np.testing.assert_allclose(Ts[0], tpose[0], atol=1e-6)
    for i in range(1, 24):
        np.testing.assert_allclose(
            Ts[i], tpose[i] - tpose[body.SMPL_PARENT[i]], atol=1e-6)


def test_canonical_global_tfms_translations_are_absolute(rng):
    joints = _rest_joints(rng)
    g = body.get_canonical_global_tfms(joints)
    assert g.shape == (24, 4, 4)
    np.testing.assert_allclose(g[:, :3, 3], joints, atol=1e-5)
    np.testing.assert_allclose(
        g[:, :3, :3], np.broadcast_to(np.eye(3), (24, 3, 3)), atol=1e-6)


def test_gaussian_bone_volumes(rng):
    joints = _rest_joints(rng)
    lo = joints.min(0) - 0.3
    hi = joints.max(0) + 0.3
    vol = body.approx_gaussian_bone_volumes(joints, lo, hi, grid_size=16)
    assert vol.shape == (25, 16, 16, 16)
    assert np.all(vol >= 0)
    np.testing.assert_allclose(vol.sum(0), 1.0, atol=1e-5)
    # a voxel at a bone midpoint should weight that bone's parent channel high
    mid = (joints[0] + joints[1]) / 2  # pelvis->left hip bone, channel 0
    idx = np.clip(((mid - lo) / (hi - lo) * 15).round().astype(int), 0, 15)
    ix, iy, iz = idx
    assert vol[0, iz, iy, ix] > vol[24, iz, iy, ix] * 0.5  # beats background


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------

def _simple_camera():
    K = np.array([[500.0, 0, 32], [0, 500.0, 24], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([0.0, 0.0, 2.0])
    return K, R, T


def test_rays_from_krt_principal_ray():
    K, R, T = _simple_camera()
    rays_o, rays_d = camera.get_rays_from_KRT(48, 64, K, R, T)
    np.testing.assert_allclose(rays_o[0, 0], -R.T @ T, atol=1e-6)
    # principal pixel ray points along camera z (world z here)
    d = rays_d[24, 32]
    np.testing.assert_allclose(d / np.linalg.norm(d), [0, 0, 1], atol=1e-6)


def test_rays_intersect_3d_bbox():
    bounds = {"min_xyz": np.array([-1.0, -1, 4]),
              "max_xyz": np.array([1.0, 1, 6])}
    rays_o = np.array([[0.0, 0, 0], [0, 0, 0], [5.0, 5, 0]], dtype=np.float32)
    rays_d = np.array([[0.0, 0, 1], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
    near, far, mask = camera.rays_intersect_3d_bbox(bounds, rays_o, rays_d)
    assert mask.tolist() == [True, False, False]
    np.testing.assert_allclose(near, [4 - 0.01], atol=1e-3)
    np.testing.assert_allclose(far, [6 + 0.01], atol=1e-3)
    # in-place clamp of tiny direction components (reference behavior)
    assert np.all(np.abs(rays_d) >= 1e-5)


def test_apply_global_tfm_identity():
    E = np.eye(4)
    E[:3, 3] = [1, 2, 3]
    out = camera.apply_global_tfm_to_camera(E, np.zeros(3), np.zeros(3))
    np.testing.assert_allclose(out, E, atol=1e-6)


def test_orbit_camera_period():
    E = np.eye(4)
    E[:3, 3] = [0, 0, 5.0]
    e0 = camera.rotate_camera_by_frame_idx(E, 0, period=100)
    e_full = camera.rotate_camera_by_frame_idx(E, 100, period=100)
    np.testing.assert_allclose(e0, E, atol=1e-6)
    np.testing.assert_allclose(e_full, E, atol=1e-6)
    e_half = camera.rotate_camera_by_frame_idx(E, 50, period=100)
    assert not np.allclose(e_half, E, atol=1e-3)


# ---------------------------------------------------------------------------
# mesh ops
# ---------------------------------------------------------------------------

def test_vertex_normals_tetrahedron():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    vn = mesh.vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-6)
    # apex vertex 3 normal should point away from base (positive z-ish)
    assert vn[3] @ np.array([1, 1, 1]) > 0


def test_fps_properties(rng):
    pts = rng.normal(size=(500, 3))
    idx = mesh.farthest_point_sampling(pts, ratio=0.25)
    assert len(idx) == 125
    assert len(np.unique(idx)) == 125
    # FPS min pairwise distance should beat random sampling's
    sel = pts[idx]
    rand = pts[rng.choice(500, 125, replace=False)]

    def min_pair(x):
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        d[np.arange(len(x)), np.arange(len(x))] = np.inf
        return d.min()

    assert min_pair(sel) > min_pair(rand)


def test_multiscale_fps_sizes(rng):
    pts = rng.normal(size=(640, 3))
    levels = mesh.multiscale_fps_indices(pts)
    assert [len(l) for l in levels] == [160, 40, 10]


# ---------------------------------------------------------------------------
# SMPL
# ---------------------------------------------------------------------------

@pytest.fixture()
def smpl(tmp_path):
    model = synthetic_smpl_model(n_verts=256, seed=1)
    p = tmp_path / "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"
    save_model(model, str(p))
    return SMPL(sex="neutral", model_dir=str(tmp_path))


def test_smpl_zero_pose_is_shaped_template(smpl, rng):
    betas = rng.normal(0, 1, 10)
    verts, joints = smpl(np.zeros(72), betas)
    v_shaped = (smpl.shapedirs.reshape(-1, 10) @ betas).reshape(-1, 3) \
        + smpl.v_template
    np.testing.assert_allclose(verts, v_shaped, atol=1e-5)
    np.testing.assert_allclose(joints, smpl.J_regressor @ v_shaped, atol=1e-5)


def test_smpl_root_rotation_is_rigid(smpl, rng):
    betas = np.zeros(10)
    verts0, joints0 = smpl(np.zeros(72), betas)
    pose = np.zeros(72)
    pose[:3] = [0.3, -0.2, 0.5]
    verts1, joints1 = smpl(pose, betas)
    R0 = camera._exact_rodrigues(pose[:3])
    j0 = joints0[0]
    np.testing.assert_allclose(verts1, (verts0 - j0) @ R0.T + j0, atol=1e-3)
    np.testing.assert_allclose(joints1, (joints0 - j0) @ R0.T + j0, atol=1e-3)


def test_smpl_trans_shifts(smpl):
    trans = np.array([1.0, 2.0, 3.0])
    v0, j0 = smpl(np.zeros(72), np.zeros(10))
    v1, j1 = smpl(np.zeros(72), np.zeros(10), trans=trans)
    np.testing.assert_allclose(v1 - v0, np.broadcast_to(trans, v0.shape),
                               atol=1e-5)


def test_smpl_accepts_rotation_matrices(smpl, rng):
    pose = rng.normal(0, 0.2, 72)
    R = body.rodrigues(pose.reshape(24, 3))
    v_aa, _ = smpl(pose, np.zeros(10))
    v_R, _ = smpl(R, np.zeros(10))
    np.testing.assert_allclose(v_aa, v_R, atol=1e-3)


def test_estimate_pointcloud_normals_plane():
    from occnerf_tpu.utils.mesh import estimate_pointcloud_normals
    rng = np.random.default_rng(0)
    pts = np.zeros((60, 3), np.float32)
    pts[:, :2] = rng.normal(0, 1.0, (60, 2))       # z = 0 plane
    normals = estimate_pointcloud_normals(pts, neighborhood_size=8)
    # unoriented: |n_z| ~ 1
    assert np.all(np.abs(np.abs(normals[:, 2]) - 1.0) < 1e-4)
