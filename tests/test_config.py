import os
import textwrap

import pytest

from occnerf_tpu.config import CfgNode, get_default_cfg, init_cfg, set_cfg, cfg
from occnerf_tpu import registry


def test_defaults_match_reference_surface():
    c = get_default_cfg()
    # spot-check the public keys the reference defines in default.yaml
    assert c.total_bones == 24
    assert c.bbox_offset == 0.3
    assert c.N_samples == 128
    assert c.chunk == 32768
    assert c.netchunk_per_gpu == 300000
    assert c.patch.N_patches == 6 and c.patch.size == 32
    assert c.patch.sample_subject_ratio == 0.8
    assert c.train.maxiter == 50000
    assert c.train.lr == 0.0005
    assert c.train.lr_mweight_vol_decoder == 0.00005
    assert c.train.lossweights.lpips == 1.0
    assert c.train.lossweights.mse == 0.2
    assert c.train.lrate_decay == 500
    assert c.occlusion.range == 405
    assert c.non_rigid_motion_mlp.kick_in_iter == 1000000
    assert c.mweight_volume.volume_size == 32
    assert c.eval_iter == 10000000


def test_merge_from_file_and_list(tmp_path):
    yaml_text = textwrap.dedent("""
        task: 'zju_mocap'
        subject: 'p387'
        experiment: 'occnerf'
        occlude: True
        occlusion:
          range: 432
          width: 66
        canonical_mlp:
          module: 'core.nets.occnerf.canonical_mlps.occnerf_mlp'
          mlp_depth: 4
        train:
          maxiter: 100000
        bgcolor: [0., 0., 0.]
        resize_img_scale: 0.5
    """)
    p = tmp_path / "subject.yaml"
    p.write_text(yaml_text)

    c = init_cfg(str(p), opts=["N_samples", "64", "train.lr", "0.001"])
    assert c.occlude is True                      # new key introduced by overlay
    assert c.occlusion.range == 432
    assert c.occlusion.mid == 451                 # default preserved
    assert c.canonical_mlp.mlp_depth == 4
    assert c.canonical_mlp.mlp_width == 256
    assert c.train.maxiter == 100000
    assert c.N_samples == 64
    assert c.train.lr == 0.001
    assert c.resize_img_scale == 0.5
    assert c.logdir == os.path.join("experiments", "occnerf", "zju_mocap",
                                    "p387", "occnerf")
    # proxy observes it
    assert cfg.train.maxiter == 100000


def test_type_checked_merge():
    c = get_default_cfg()
    with pytest.raises(ValueError):
        c.merge_from_dict({"total_bones": "many"})
    # int over float is allowed (widening), bool over int is not silently lost
    c.merge_from_dict({"perturb": 0})
    assert c.perturb == 0.0


def test_clone_is_deep():
    c = get_default_cfg()
    c2 = c.clone()
    c2.train.maxiter = 1
    assert c.train.maxiter == 50000


def test_registry_aliases_reference_paths():
    assert registry.registered("canonical_mlp")[
        "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    ].startswith("occnerf_tpu.models.canonical")
    with pytest.raises(KeyError):
        registry.resolve("canonical_mlp", "nonexistent.module")


def test_cli_value_decoding():
    c = get_default_cfg()
    c.merge_from_list(["crop_image_scale", "[256, 256]", "show_alpha", "True"])
    assert c.crop_image_scale == [256, 256]
    assert c.show_alpha is True
