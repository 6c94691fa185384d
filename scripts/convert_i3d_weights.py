"""Convert a torch I3D checkpoint into the .npz eval/i3d.py loads.

Completes the FVD calibration path (the reference imports the absent
scripts/fvd.py, latentdiffusion/sample_diffusion.py:477-488): this box has
no network egress, so the Kinetics-400 I3D weights convert offline from
any torch-format checkpoint (state dict or torchscript) in the standard
`<Unit>.conv3d.weight` / `<Unit>.bn.*` naming:

    python scripts/convert_i3d_weights.py --i3d /path/to/rgb_i3d.pt --out i3d.npz

BatchNorm is folded into per-channel scale/bias (inference only).  Output
keys: `<unit>/kernel` (DHWIO), `<unit>/scale`, `<unit>/bias`.

Usage from eval code: `fvd(..., feature_fn=i3d_npz_feature_fn("i3d.npz"))`.
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def load_torch_sd(path):
    import torch

    try:
        obj = torch.jit.load(path, map_location="cpu")
        return dict(obj.state_dict())
    except Exception:
        obj = torch.load(path, map_location="cpu")
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i3d", required=True, help="torch I3D checkpoint (.pt/.pth, torchscript or state dict)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jointimagegeneration_tpu.eval.i3d import parse_torch_i3d_sd

    units = parse_torch_i3d_sd(load_torch_sd(args.i3d))
    if not units:
        raise SystemExit("no `<unit>.conv3d.weight` tensors found — unrecognised checkpoint layout")
    out = {}
    for unit, leaves in units.items():
        for leaf, arr in leaves.items():
            out[f"{unit}/{leaf}"] = arr
    np.savez(args.out, **out)
    print(f"converted {len(units)} I3D units -> {args.out}")


if __name__ == "__main__":
    main()
