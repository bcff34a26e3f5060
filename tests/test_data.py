"""Data-pipeline tests: synthetic subject, static shapes, all dataset types.

Field contract from the reference `core/data/occnerf/train.py:353-537`
(SURVEY.md §2.1), adapted to static TPU shapes (occnerf_tpu/data/rays.py).
"""

import numpy as np
import pytest

from occnerf_tpu.config import cfg, set_cfg, get_default_cfg
from occnerf_tpu.data.synthetic import make_synthetic_subject


@pytest.fixture(scope="module")
def subject_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("subject")
    return make_synthetic_subject(str(path), n_frames=4, img_size=96,
                                  n_verts=256, seed=0)


@pytest.fixture()
def syn_cfg(subject_dir):
    c = get_default_cfg()
    c.synthetic_dataset_path = subject_dir
    c.render_frames = 3
    set_cfg(c)
    return c


def test_train_item_static_shapes(syn_cfg):
    from occnerf_tpu.data import create_dataset
    ds = create_dataset("train")
    n = cfg.patch.N_patches * cfg.patch.size ** 2
    for idx in (0, 1):
        item = ds[idx]
        assert item["rays"].shape == (2, n, 3)
        assert item["near"].shape == (n, 1)
        assert item["far"].shape == (n, 1)
        assert item["ray_valid"].shape == (n,)
        assert item["patch_masks"].shape == (
            cfg.patch.N_patches, cfg.patch.size, cfg.patch.size)
        assert item["target_patches"].shape == (
            cfg.patch.N_patches, cfg.patch.size, cfg.patch.size, 3)
        assert item["dst_Rs"].shape == (24, 3, 3)
        assert item["cnl_gtfms"].shape == (24, 4, 4)
        assert item["motion_weights_priors"].shape == (25, 32, 32, 32)
        assert item["dst_posevec"].shape == (69,)
        # valid rays have far > near; invalid rays have near = far = 0
        v = item["ray_valid"] > 0
        assert np.all(item["far"][v, 0] > item["near"][v, 0])
        assert np.all(item["near"][~v, 0] == 0)
        assert np.all(item["far"][~v, 0] == 0)
        # patch_masks agrees with ray_valid
        assert np.array_equal(item["patch_masks"].reshape(-1),
                              item["ray_valid"] > 0)


def test_train_random_bgcolor_and_seeding(syn_cfg, subject_dir):
    from occnerf_tpu.data.train import Dataset
    kw = dict(dataset_path=subject_dir, keyfilter=cfg.train_keyfilter,
              ray_shoot_mode="patch")
    a = Dataset(seed=0, **kw)[0]
    b = Dataset(seed=0, **kw)[0]
    c = Dataset(seed=1, **kw)[0]
    np.testing.assert_array_equal(a["bgcolor"], b["bgcolor"])
    assert not np.array_equal(a["bgcolor"], c["bgcolor"])
    np.testing.assert_array_equal(a["rays"], b["rays"])


def test_image_mode_padding_and_unpack(syn_cfg):
    from occnerf_tpu.data import create_dataset, unpack_to_image
    ds = create_dataset("movement")
    item = ds[0]
    bucket = cfg.tpu.eval_ray_bucket
    n = item["rays"].shape[1]
    assert n % bucket == 0
    n_valid = int(item["n_valid_rays"])
    assert int(item["ray_valid"].sum()) == n_valid
    assert n_valid == int(item["ray_mask"].sum())

    H, W = item["img_height"], item["img_width"]
    rgb = unpack_to_image(H, W, item["ray_mask"], np.zeros(3),
                          item["target_rgbs"], n_valid)
    assert rgb.shape == (H, W, 3)
    # padded tail contributes nothing
    assert np.all(item["target_rgbs"][n_valid:] == 0)


def test_occlusion_zeroes_mask_columns(syn_cfg, subject_dir):
    from occnerf_tpu.data.train import Dataset
    c = cfg.node()
    c.occlusion.range = 10
    c.occlusion.mid = 48
    c.occlusion.width = 20
    ds = Dataset(dataset_path=subject_dir, keyfilter=["rays"],
                 ray_shoot_mode="image", occlude=True, seed=0)
    item0 = ds[0]
    ds_no = Dataset(dataset_path=subject_dir, keyfilter=["rays"],
                    ray_shoot_mode="image", occlude=False, seed=0)
    item1 = ds_no[0]
    # occlusion strictly reduces the alpha (ray_alpha) mass
    assert item0["ray_alpha"].sum() <= item1["ray_alpha"].sum()


def test_all_render_dataset_types(syn_cfg):
    from occnerf_tpu.data import create_dataloader
    for t in ["movement", "progress", "freeview", "tpose", "backview",
              "allview"]:
        dl = create_dataloader(t)
        item = next(iter(dl))
        assert item["rays"].shape[0] == 2
        assert item["rays"].shape[1] % cfg.tpu.eval_ray_bucket == 0
        for key in ("dst_Rs", "dst_Ts", "cnl_gtfms",
                    "motion_weights_priors", "cnl_bbox_min_xyz",
                    "dst_posevec", "bgcolor"):
            assert key in item, (t, key)


def test_progress_subsampling(syn_cfg):
    from occnerf_tpu.data import create_dataset
    ds = create_dataset("progress")
    assert len(ds) <= 16


def test_loader_prefetch_order(syn_cfg):
    from occnerf_tpu.data import create_dataset
    from occnerf_tpu.data.loader import DataLoader
    ds = create_dataset("movement")
    dl = DataLoader(ds, shuffle=False, num_workers=2, prefetch=2)
    names = [item["frame_name"] for item in dl]
    assert names == [ds[i]["frame_name"] for i in range(len(ds))]


def test_loader_workers_actually_parallel():
    """num_workers=N must decode with N concurrent threads (the round-4
    loader spawned exactly one producer regardless of the knob)."""
    import threading
    import time as _time

    from occnerf_tpu.data.loader import DataLoader

    class SlowDS:
        def __init__(self):
            self.lock = threading.Lock()
            self.active = 0
            self.max_active = 0

        def __len__(self):
            return 8

        def __getitem__(self, i):
            with self.lock:
                self.active += 1
                self.max_active = max(self.max_active, self.active)
            _time.sleep(0.05)
            with self.lock:
                self.active -= 1
            return {"i": i}

    ds = SlowDS()
    out = [item["i"] for item in DataLoader(ds, num_workers=4, prefetch=4)]
    assert out == list(range(8))
    assert ds.max_active >= 2, "workers never overlapped"


def test_loader_early_break_cleans_up(syn_cfg):
    from occnerf_tpu.data import create_dataset
    from occnerf_tpu.data.loader import DataLoader
    ds = create_dataset("movement")
    dl = DataLoader(ds, shuffle=False, num_workers=2, prefetch=2)
    it = iter(dl)
    first = next(it)
    assert first["frame_name"] == ds[0]["frame_name"]
    it.close()  # must not hang or leak; a fresh epoch still works
    names = [item["frame_name"] for item in dl]
    assert names == [ds[i]["frame_name"] for i in range(len(ds))]


def test_dataset_args_registry(syn_cfg):
    from occnerf_tpu.data import DatasetArgs
    c = cfg.node()
    c.task = "zju_mocap"
    args = DatasetArgs.get("zju_387_train")
    assert args["dataset_path"].endswith("387")
    c.eval = True
    args = DatasetArgs.get("zju_387_test")
    assert "processed" in args["dataset_path"]
    with pytest.raises(KeyError):
        DatasetArgs.get("nonexistent")


def test_native_ray_sampler_matches_numpy():
    from occnerf_tpu import native
    from occnerf_tpu.data.rays import build_rays
    if not native.available():
        pytest.skip("no native toolchain")
    H = W = 96
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    E = np.eye(4)
    E[:3, 3] = [0.05, -0.1, 2.5]
    bbox = {"min_xyz": np.array([-0.6, -0.9, -0.4]),
            "max_xyz": np.array([0.6, 0.9, 0.4])}
    a = build_rays(H, W, K, E, bbox, use_native=True)
    b = build_rays(H, W, K, E, bbox, use_native=False)
    assert np.array_equal(a["ray_mask"], b["ray_mask"])
    for k in ("rays_o", "rays_d", "near", "far"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-4)
