#!/usr/bin/env python
"""Convert a reference OccNeRF torch checkpoint into this framework's
parameter pytree.

Offline, one-time tool: reads a ``{logdir}/{name}.tar`` produced by the
reference trainer (``{'iter', 'network': state_dict, 'optimizer': ...}``,
reference `trainer.py:398-406`) and writes an ``.npz`` checkpoint loadable
by ``occnerf_tpu.train.checkpoint`` (params + state sections; the
optimizer section is left empty — resume optimizer state is not
transferable across frameworks).

Key mapping (torch -> ours):
    mweight_vol_decoder.const_embedding            -> mweight.const_embedding
    mweight_vol_decoder.decoder.block_mlp.0.{w,b}  -> mweight.mlp
    mweight_vol_decoder.decoder.block_conv.{2i}.*  -> mweight.convs[i]
    non_rigid_mlp.module.block_mlps.{2i}.{w,b}     -> non_rigid_mlp.layers[i]
    pose_decoder.block_mlps.{2i}.{w,b}             -> pose_decoder.layers[i]
    cnl_mlp.module.encoder.embeddings              -> cnl_mlp.encoder
    cnl_mlp.module.pts_linears.{2i}.*              -> cnl_mlp.pts_linears[i]
    cnl_mlp.module.geo_linear.0.*                  -> cnl_mlp.geo_linear
    cnl_mlp.module.rgb_linears.{2i}.*              -> cnl_mlp.rgb_linears[i]
    cnl_mlp.module.output_linear.0.*               -> cnl_mlp.output_linear
    point_dist                                     -> point_dist
    point_counter                                  -> state.point_counter

torch Linear weights are (out, in) -> transposed to (in, out);
ConvTranspose3d weights are (in, out, k, k, k) in both.

Usage:
    python tools/convert_reference_checkpoint.py \
        --input experiments/.../latest.tar --output latest_converted.npz
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return {"w": w.T.copy(), "b": b}


def _seq_linears(sd: Dict[str, Any], prefix: str) -> list:
    """All Linear layers of an interleaved Linear/ReLU Module{List,
    Sequential}, in index order."""
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(rf"{re.escape(prefix)}\.(\d+)\.weight",
                                     k))})
    return [_linear(sd, f"{prefix}.{i}") for i in idxs]


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference network state_dict -> (params, state) pytrees (numpy)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def has(prefix):
        return any(k.startswith(prefix) for k in sd)

    params: Dict[str, Any] = {}

    # motion weight volume decoder
    if has("mweight_vol_decoder.decoder"):
        convs = []
        conv_idxs = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(
                r"mweight_vol_decoder\.decoder\.block_conv\.(\d+)\.weight",
                k))})
        for i in conv_idxs:
            w = np.asarray(
                sd[f"mweight_vol_decoder.decoder.block_conv.{i}.weight"],
                np.float32)
            b = np.asarray(
                sd[f"mweight_vol_decoder.decoder.block_conv.{i}.bias"],
                np.float32)
            convs.append({"w": w, "b": b})
        params["mweight_vol_decoder"] = {
            "const_embedding": np.asarray(
                sd["mweight_vol_decoder.const_embedding"], np.float32),
            "mlp": _linear(sd, "mweight_vol_decoder.decoder.block_mlp.0"),
            "convs": convs,
        }
    elif has("mweight_vol_decoder.matrix"):
        params["mweight_vol_decoder"] = {
            "matrix": np.asarray(sd["mweight_vol_decoder.matrix"],
                                 np.float32)}

    # non-rigid MLP (DataParallel 'module.' prefix)
    nr_prefix = ("non_rigid_mlp.module.block_mlps"
                 if has("non_rigid_mlp.module") else
                 "non_rigid_mlp.block_mlps")
    if has(nr_prefix.rsplit(".", 1)[0]):
        params["non_rigid_mlp"] = {"layers": _seq_linears(sd, nr_prefix)}

    # pose decoder
    if has("pose_decoder.block_mlps"):
        params["pose_decoder"] = {
            "layers": _seq_linears(sd, "pose_decoder.block_mlps")}

    # canonical MLP
    cnl = ("cnl_mlp.module" if has("cnl_mlp.module") else "cnl_mlp")
    if has(cnl):
        if f"{cnl}.encoder.embeddings" in sd:
            # occnerf_mlp
            params["cnl_mlp"] = {
                "encoder": np.asarray(sd[f"{cnl}.encoder.embeddings"],
                                      np.float32),
                "pts_linears": _seq_linears(sd, f"{cnl}.pts_linears"),
                "geo_linear": _linear(sd, f"{cnl}.geo_linear.0"),
                "rgb_linears": _seq_linears(sd, f"{cnl}.rgb_linears"),
                "output_linear": _linear(sd, f"{cnl}.output_linear.0"),
            }
        else:
            # vanilla mlp_rgb_sigma: pts_linears + output_linear
            layers = _seq_linears(sd, f"{cnl}.pts_linears")
            params["cnl_mlp"] = {
                "layers": layers,
                "output": _linear(sd, f"{cnl}.output_linear.0")
                if f"{cnl}.output_linear.0.weight" in sd
                else _linear(sd, f"{cnl}.output_linear"),
            }

    if "point_dist" in sd:
        params["point_dist"] = np.asarray(sd["point_dist"], np.float32)

    state: Dict[str, Any] = {}
    if "point_counter" in sd:
        state["point_counter"] = np.asarray(sd["point_counter"],
                                            np.float32)
    return params, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="reference .tar ckpt")
    ap.add_argument("--output", required=True, help="output .npz ckpt")
    args = ap.parse_args()

    import torch  # host-only tool

    ckpt = torch.load(args.input, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["network"].items()}
    params, state = convert_state_dict(sd)

    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir))
    from occnerf_tpu.train import checkpoint as ck

    logdir = os.path.dirname(args.output) or "."
    name = os.path.splitext(os.path.basename(args.output))[0]
    path = ck.save_ckpt(logdir, name, iter_val=int(ckpt.get("iter", 0)),
                        params=params, state=state, opt_state=None)
    print(f"wrote {path} (iter {int(ckpt.get('iter', 0))})")


if __name__ == "__main__":
    main()
