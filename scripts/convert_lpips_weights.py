"""Convert torch LPIPS weights into the single .npz eval/lpips.py loads.

The reference's LPIPS (ldm/modules/losses/lpips.py:53-173) needs two weight
sources: the torchvision VGG16 backbone (downloaded at runtime there) and
the learned per-layer linear calibration heads (shipped as
taming/modules/autoencoder/lpips/vgg.pth — five `lin<k>.model.1.weight`
tensors).  This box has no network egress, so conversion is offline:

    python scripts/convert_lpips_weights.py \
        --vgg16 /path/to/vgg16-397923af.pth \
        --lins  /path/to/taming_lpips_vgg.pth \
        --out   lpips_vgg16.npz

Either source may be omitted (e.g. convert only the lin heads while the
backbone stays random-projection — still uncalibrated, but the file is then
drop-in completable later).  Output keys: conv_<i>_kernel (HWIO),
conv_<i>_bias, lin_<k>, for i in conv order (13 convs) and k in 0..4.

Usage from eval code: `LPIPS(weights_path="lpips_vgg16.npz")`.
"""

import argparse

import numpy as np


def load_torch_sd(path):
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("--lins", help="LPIPS/taming lin-head state dict (.pth)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jointimagegeneration_tpu.eval.lpips import parse_torch_lpips_sd

    out = {}
    if args.vgg16:
        conv_w, conv_b, _ = parse_torch_lpips_sd(load_torch_sd(args.vgg16))
        for pos, kern in conv_w.items():
            out[f"conv_{pos}_kernel"] = kern
            if pos in conv_b:
                out[f"conv_{pos}_bias"] = conv_b[pos]
        print(f"converted {len(conv_w)} convs from {args.vgg16}")
    if args.lins:
        _, _, lins = parse_torch_lpips_sd(load_torch_sd(args.lins))
        for idx, w in lins.items():
            out[f"lin_{idx}"] = w
        print(f"converted {len(lins)} lin heads from {args.lins}")
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
