#!/usr/bin/env python
"""Strip chumpy objects from an SMPL model pickle.

Behavioral equivalent of the reference's `clean_ch.py`: the official SMPL
pickles store arrays as chumpy objects that need the (py2-era) chumpy
package to unpickle; this converts them to plain numpy so the framework's
loader works without chumpy.  Requires chumpy only to READ the original.

Usage:
    python tools/clean_smpl_pkl.py --input basicModel_neutral_....pkl \
        --output third_parties/smpl/models/basicModel_neutral_....pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def clean(input_path: str, output_path: str) -> None:
    with open(input_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    out = {}
    for key, value in data.items():
        if hasattr(value, "r"):        # chumpy object -> its array view
            value = np.asarray(value.r)
        elif hasattr(value, "todense"):
            value = np.asarray(value.todense())
        out[key] = value

    with open(output_path, "wb") as f:
        pickle.dump(out, f, protocol=2)
    print(f"wrote {output_path} ({len(out)} keys)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    clean(args.input, args.output)


if __name__ == "__main__":
    main()
