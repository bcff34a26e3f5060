#!/usr/bin/env python
"""Quantitative evaluation entry point.

Same CLI surface and metric set as the reference (`eval.py`): full
evaluation on the ``movement`` split with ``evaluate=True`` —
PSNR-vis/body/full, SSIM per region (from the full SSIM map), completeness
IoU from predicted alpha vs the GT mask — with ``cfg.eval=True`` switching
dataset paths to the processed eval set and a white background
(`eval.py:8-9`).
"""

from __future__ import annotations

import os

import numpy as np

from occnerf_tpu.config import cfg, make_cfg, parse_args


def lpips_metric(model, pred, target):
    """LPIPS distance between two [0,1] HxWx3 images (defined but not
    called inside the eval loop — mirroring the reference, `eval.py:90-97`,
    whose LPIPS model is instantiated yet unused)."""
    import jax.numpy as jnp

    from occnerf_tpu.metrics.lpips import scale_for_lpips
    d = model[0].apply(model[1],
                       scale_for_lpips(jnp.asarray(pred)[None]),
                       scale_for_lpips(jnp.asarray(target)[None]))
    return float(d.reshape(()))


def eval_model(render_folder_name: str = "eval", show_truth: bool = True,
               show_alpha: bool = True) -> dict:
    from occnerf_tpu.app import load_network_for_eval, make_renderer
    from occnerf_tpu.data import create_dataloader, unpack_to_image
    from occnerf_tpu.metrics import (completeness_iou, psnr_metric,
                                     structural_similarity)
    from occnerf_tpu.utils.image import ImageWriter, to_8b3ch_image, \
        to_8b_image

    cfg.perturb = 0.0
    cfg.occlude = False
    loader = create_dataloader("movement", evaluate=True)
    subject = loader.dataset.subject
    network, statics, params, state = load_network_for_eval(subject)

    writer = ImageWriter(output_dir=os.path.join(cfg.logdir, cfg.load_net),
                         exp_name=render_folder_name)

    render = make_renderer(network, statics, params, state,
                           ignore_non_rigid=False)

    acc = {k: [] for k in ("psnr_vis", "ssim_vis", "psnr_body", "ssim_body",
                           "psnr_full", "ssim_full", "iou")}
    bg = np.asarray(cfg.bgcolor, np.float32) / 255.0

    for idx, batch in enumerate(loader):
        out = render(batch)
        H, W = batch["img_height"], batch["img_width"]
        n = int(batch["n_valid_rays"])
        ray_mask = batch["ray_mask"]

        rgb_img = unpack_to_image(H, W, ray_mask, bg,
                                  np.asarray(out["rgb"]), n)
        truth_img = unpack_to_image(H, W, ray_mask, bg,
                                    np.asarray(batch["target_rgbs"]), n)
        alpha_map = unpack_to_image(H, W, ray_mask, 0.0,
                                    np.asarray(out["alpha"]), n)

        # masks: body = rays hitting the bbox; vis = GT-mask pixels
        body_mask = ray_mask
        gt_mask = np.zeros(H * W, np.float32)
        gt_mask[ray_mask] = np.asarray(batch["ray_alpha"])[:n, 0]
        alpha_mask = gt_mask > 0.5

        # completeness IoU (`eval.py:169-178`): predicted alpha > 0.1 vs
        # GT mask > 0.5
        acc["iou"].append(completeness_iou(
            alpha_map.reshape(-1), alpha_mask, pred_threshold=0.1))

        flat_rgb = rgb_img.reshape(-1, 3)
        flat_truth = truth_img.reshape(-1, 3)
        acc["psnr_body"].append(psnr_metric(flat_rgb[body_mask],
                                            flat_truth[body_mask]))
        acc["psnr_vis"].append(psnr_metric(flat_rgb[alpha_mask],
                                           flat_truth[alpha_mask]))
        acc["psnr_full"].append(psnr_metric(rgb_img, truth_img))

        ssim, full = structural_similarity(rgb_img, truth_img,
                                           multichannel=True, full=True)
        full = full.reshape(-1, 3)
        acc["ssim_full"].append(ssim)
        acc["ssim_body"].append(float(np.mean(full[body_mask])))
        acc["ssim_vis"].append(float(np.mean(full[alpha_mask])))

        imgs = [to_8b_image(rgb_img)]
        if show_truth:
            imgs.append(to_8b_image(truth_img))
        if show_alpha:
            imgs.append(to_8b3ch_image(alpha_map))
        writer.append(np.concatenate(imgs, axis=1),
                      img_name=batch["frame_name"])
        print("PSNR-vis: %.4f, SSIM-vis: %.4f; PSNR-body: %.4f, "
              "SSIM-body: %.4f; PSNR-full: %.4f, SSIM-full: %.4f, "
              "IOU: %.4f" % (acc["psnr_vis"][-1], acc["ssim_vis"][-1],
                             acc["psnr_body"][-1], acc["ssim_body"][-1],
                             acc["psnr_full"][-1], acc["ssim_full"][-1],
                             acc["iou"][-1]))

    means = {k: float(np.mean(v)) for k, v in acc.items()}
    print("IOU", means["iou"])
    print(f"PSNR_vis {means['psnr_vis']}, SSIM_vis {means['ssim_vis']}; "
          f"PSNR_body {means['psnr_body']}, SSIM_body {means['ssim_body']}; "
          f"PSNR_full {means['psnr_full']}, SSIM_full {means['ssim_full']}")
    return means


def main() -> None:
    from occnerf_tpu.utils.platform import ensure_platform
    ensure_platform()
    parse_args()
    make_cfg()
    cfg.bgcolor = [255.0, 255.0, 255.0]
    cfg.eval = True
    # the reference instantiates LPIPS here (eval.py:122-124) though its
    # loop never calls it; surface the weights status loudly either way
    from occnerf_tpu.metrics.lpips import LPIPS
    LPIPS.announce("eval")
    eval_model(render_folder_name="eval")


if __name__ == "__main__":
    main()
