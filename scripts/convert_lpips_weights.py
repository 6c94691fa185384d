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

    out = {}
    if args.vgg16:
        sd = load_torch_sd(args.vgg16)
        conv_keys = sorted(
            (k for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4),
            key=lambda k: [int(p) if p.isdigit() else p for p in k.split(".")],
        )
        for pos, k in enumerate(conv_keys):
            out[f"conv_{pos}_kernel"] = np.transpose(sd[k].numpy(), (2, 3, 1, 0))
            bk = k[: -len("weight")] + "bias"
            if bk in sd:
                out[f"conv_{pos}_bias"] = sd[bk].numpy()
        print(f"converted {len(conv_keys)} convs from {args.vgg16}")
    if args.lins:
        sd = load_torch_sd(args.lins)
        n = 0
        for k, v in sd.items():
            if "lin" in k and v.ndim == 4 and v.shape[0] == 1:
                idx = int("".join(ch for ch in k.split(".")[0] if ch.isdigit()) or n)
                out[f"lin_{idx}"] = v.numpy().reshape(-1)
                n += 1
        print(f"converted {n} lin heads from {args.lins}")
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
