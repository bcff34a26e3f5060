#!/usr/bin/env python
"""Convert torch LPIPS weights to the jax .npz this framework loads.

Offline, one-time tool (needs the torchvision VGG16 checkpoint and an
LPIPS linear-head checkpoint, both torch ``state_dict`` pickles):

    python tools/convert_lpips_weights.py \
        --vgg  ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
        --lins third_parties/lpips/weights/v0.1/vgg.pth \
        --out  third_parties/lpips/lpips_vgg.npz

Mapping: torchvision ``features.{idx}.weight`` (OIHW) -> ``conv{i}_w``
(HWIO); LPIPS ``lin{k}.model.1.weight`` (1, C, 1, 1) -> ``lin{k}`` (C,).

``--vgg`` is optional: with only ``--lins``, a heads-only .npz is
written (the reference ships the learned heads in-repo at
`third_parties/lpips/weights/v0.1/vgg.pth`; the torchvision backbone is
the only environmental piece).  The runtime loads such a file in
"heads-only" hybrid mode (see occnerf_tpu/metrics/lpips.py).
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", default=None,
                    help="torchvision vgg16 state_dict (.pth); omit to "
                         "write a heads-only npz")
    ap.add_argument("--lins", required=True,
                    help="LPIPS v0.1 linear heads state_dict (.pth)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    import torch  # local import: host-only tool

    lins = torch.load(args.lins, map_location="cpu")

    out = {}
    if args.vgg is not None:
        vgg = torch.load(args.vgg, map_location="cpu")
        conv_i = 0
        # torchvision vgg16.features indices of conv layers
        for idx in [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]:
            w = vgg[f"features.{idx}.weight"].numpy()      # (O, I, H, W)
            b = vgg[f"features.{idx}.bias"].numpy()
            out[f"conv{conv_i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            out[f"conv{conv_i}_b"] = b
            conv_i += 1

    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in lins:
                out[f"lin{k}"] = lins[key].numpy().reshape(-1)
                break
        else:
            raise KeyError(f"linear head {k} not found in {args.lins}")

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
