"""Dataset-name registry: name -> Dataset kwargs.

Same public surface as the reference (`core/data/dataset_args.py`):
``zju_{subject}_{train,test}`` for the 9 ZJU-MoCap subjects (paths switch
to ``processed/{sub}[_eval]`` under ``cfg.eval``), ``monocular_{train,test}``
for wild captures, plus ``synthetic_{train,test}`` for the self-contained
synthetic subject used by tests and benchmarks.  Evaluated lazily against
the live cfg instead of at import time.
"""

from __future__ import annotations

from typing import Dict

from ..config import cfg

ZJU_SUBJECTS = ["313", "315", "377", "386", "387", "390", "392", "393", "394"]


def _build_attrs() -> Dict[str, Dict]:
    attrs: Dict[str, Dict] = {}
    if cfg.category == "occnerf" and cfg.get("task") == "zju_mocap":
        for sub in ZJU_SUBJECTS:
            if cfg.get("eval", False):
                train_path = f"dataset/zju_mocap/processed/{sub}"
                test_path = f"dataset/zju_mocap/processed/{sub}_eval"
            else:
                train_path = test_path = f"dataset/zju_mocap/{sub}"
            attrs[f"zju_{sub}_train"] = {
                "dataset_path": train_path,
                "keyfilter": cfg.train_keyfilter,
                "ray_shoot_mode": cfg.train.ray_shoot_mode,
            }
            attrs[f"zju_{sub}_test"] = {
                "dataset_path": test_path,
                "keyfilter": cfg.test_keyfilter,
                "ray_shoot_mode": "image",
                "src_type": "zju_mocap",
            }
    if cfg.category == "occnerf" and cfg.get("task") == "wild":
        attrs["monocular_train"] = {
            "dataset_path": "dataset/wild/" + cfg.subject,
            "keyfilter": cfg.train_keyfilter,
            "ray_shoot_mode": cfg.train.ray_shoot_mode,
        }
        attrs["monocular_test"] = {
            "dataset_path": "dataset/wild/" + cfg.subject,
            "keyfilter": cfg.test_keyfilter,
            "ray_shoot_mode": "image",
            "src_type": "wild",
        }
    # synthetic subject (tests / benchmarks; no licensed assets required)
    syn_path = cfg.get("synthetic_dataset_path", "dataset/synthetic/subject")
    attrs["synthetic_train"] = {
        "dataset_path": syn_path,
        "keyfilter": cfg.train_keyfilter,
        "ray_shoot_mode": cfg.train.ray_shoot_mode,
    }
    attrs["synthetic_test"] = {
        "dataset_path": syn_path,
        "keyfilter": cfg.test_keyfilter,
        "ray_shoot_mode": "image",
        "src_type": "zju_mocap",
    }
    return attrs


class DatasetArgs:
    @staticmethod
    def get(name: str) -> Dict:
        attrs = _build_attrs()
        if name not in attrs:
            known = ", ".join(sorted(attrs))
            raise KeyError(f"Unknown dataset '{name}'. Known: {known}")
        return dict(attrs[name])
