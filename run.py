#!/usr/bin/env python
"""Rendering entry point.

Same CLI surface as the reference (`run.py:246-247`):

    python run.py --type {movement,freeview,tpose,allview,backview,evaluate} \
        --cfg <subject.yaml> [key value ...]

Forces a white background and no depth jitter at render time
(reference `run.py:8`, `run.py:69`).
"""

from __future__ import annotations

import os

import numpy as np

from occnerf_tpu.config import args, cfg, make_cfg, parse_args


def _unpack(batch, out):
    from occnerf_tpu.data import unpack_to_image
    from occnerf_tpu.utils.image import to_8b3ch_image, to_8b_image
    H, W = batch["img_height"], batch["img_width"]
    bg = np.asarray(cfg.bgcolor, np.float32) / 255.0
    n_valid = int(batch["n_valid_rays"])
    rgb = unpack_to_image(H, W, batch["ray_mask"], bg,
                          np.asarray(out["rgb"]), n_valid)
    alpha = unpack_to_image(H, W, batch["ray_mask"], 0.0,
                            np.asarray(out["alpha"]), n_valid)
    return to_8b_image(rgb), to_8b3ch_image(alpha)


def _render_loop(data_type: str, folder_name: str):
    """Shared render skeleton (reference `_freeview`, `run.py:66-119`)."""
    from occnerf_tpu.app import load_network_for_eval, make_renderer
    from occnerf_tpu.data import create_dataloader, unpack_to_image
    from occnerf_tpu.utils.image import ImageWriter, to_8b_image

    cfg.perturb = 0.0
    loader = create_dataloader(data_type)
    subject = loader.dataset.subject
    network, statics, params, state = load_network_for_eval(subject)

    writer = ImageWriter(output_dir=os.path.join(cfg.logdir, cfg.load_net),
                         exp_name=folder_name)

    render = make_renderer(network, statics, params, state)

    for idx, batch in enumerate(loader):
        out = render(batch)
        rgb_img, alpha_img = _unpack(batch, out)
        imgs = [rgb_img]
        if cfg.show_truth and "target_rgbs" in batch:
            t = batch["target_rgbs"]
            if t.ndim == 3:  # freeview-style full image
                imgs.append(to_8b_image(np.asarray(t)))
            else:
                bg = np.asarray(cfg.bgcolor, np.float32) / 255.0
                truth = unpack_to_image(
                    batch["img_height"], batch["img_width"],
                    batch["ray_mask"], bg, np.asarray(t),
                    int(batch["n_valid_rays"]))
                imgs.append(to_8b_image(truth))
        if cfg.show_alpha:
            imgs.append(alpha_img)
        writer.append(np.concatenate(imgs, axis=1), img_name=f"{idx:06d}")
    writer.finalize()


def run_movement():
    _render_loop("movement", cfg.render_folder_name or "movement")


def run_freeview():
    _render_loop("freeview",
                 cfg.render_folder_name or
                 f"freeview_{cfg.freeview.frame_idx}")


def run_tpose():
    cfg.ignore_non_rigid_motions = True
    _render_loop("tpose", cfg.render_folder_name or "tpose")


def run_allview():
    _render_loop("allview",
                 cfg.render_folder_name or
                 f"allview_{cfg.freeview.frame_idx}")


def run_backview():
    _render_loop("backview", cfg.render_folder_name or "backview")


def run_evaluate():
    """PSNR over the progress split, skipping frames {4, 15}
    (reference `run.py:194-244,208`)."""
    from occnerf_tpu.app import load_network_for_eval, make_renderer
    from occnerf_tpu.data import create_dataloader

    cfg.perturb = 0.0
    loader = create_dataloader("progress", evaluate=True)
    subject = loader.dataset.subject
    network, statics, params, state = load_network_for_eval(subject)

    render = make_renderer(network, statics, params, state, iter_val=1.0,
                           ignore_non_rigid=False)

    psnrs = []
    skips = {4, 15}
    for idx, batch in enumerate(loader):
        if idx in skips:
            continue
        out = render(batch)
        n = int(batch["n_valid_rays"])
        rgb = np.asarray(out["rgb"])[:n]
        target = np.asarray(batch["target_rgbs"])[:n]
        mse = np.mean((rgb - target) ** 2)
        psnrs.append(20.0 * np.log10(1.0 / np.sqrt(mse)))
    print("AVG PSNR %.4f" % np.mean(psnrs))


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()
    parse_args()
    make_cfg()
    cfg.bgcolor = [255.0, 255.0, 255.0]
    fn = globals().get(f"run_{args.type}")
    if fn is None:
        raise SystemExit(f"unknown --type {args.type}")
    fn()


if __name__ == "__main__":
    main()
