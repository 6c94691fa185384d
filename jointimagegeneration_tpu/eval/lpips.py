"""LPIPS perceptual metric (VGG16 feature distance), JAX.

Equivalent of ldm/modules/losses/lpips.py:53-173 (which wraps torchvision
VGG16 + learned linear heads loaded from a shipped vgg.pth).  Here the
VGG16 feature tower is a flax module; calibrated weights can be loaded
from any torch-format VGG16/LPIPS checkpoint path (no network access is
assumed).  Without weights the module still defines a valid pseudo-
perceptual metric (unit-normalised random-projection features — zero for
identical inputs, symmetric, positive) which is what the synthetic test
rigs use; pass `weights_path` for calibrated scores.

Grayscale inputs are tiled to 3 channels; inputs are expected in [0, 1]
and shifted into LPIPS's canonical normalisation internally.

The 3-view volumetric variant mirrors sample_diffusion.py:457-475: LPIPS
averaged over axial/coronal/sagittal mid-slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["LPIPS", "lpips_three_view"]

# LPIPS canonical input scaling (lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# feature taps after the ReLU at the end of each block (relu1_2 ... relu5_3)
_TAPS = (1, 3, 6, 9, 12)


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        feats = []
        conv_i = 0
        tap = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if conv_i in _TAPS:
                    feats.append(x)
                conv_i += 1
        return feats


def _normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + eps)


def parse_torch_lpips_sd(sd):
    """Split a torch state dict into (conv kernels HWIO by position, conv
    biases, lin heads).  Accepts torchvision VGG16 layout (`features.<slot>.
    weight/bias`, slots include ReLU/pool positions so convs are taken in
    sorted-slot order) and/or the LPIPS/taming lin layout
    (`lin<k>.model.1.weight`).  Shared by the runtime loader and
    scripts/convert_lpips_weights.py."""
    conv_w, conv_b, lins = {}, {}, {}
    conv_keys = sorted(
        (k for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4 and "lin" not in k),
        key=lambda k: [int(p) if p.isdigit() else p for p in k.split(".")],
    )
    for pos, k in enumerate(conv_keys):
        conv_w[pos] = np.transpose(np.asarray(sd[k]), (2, 3, 1, 0))  # OIHW -> HWIO
        bk = k[: -len("weight")] + "bias"
        if bk in sd:
            conv_b[pos] = np.asarray(sd[bk])
    for k, v in sd.items():
        if "lin" in k and v.ndim == 4 and v.shape[0] == 1:
            idx = int("".join(ch for ch in k.split(".")[0] if ch.isdigit()) or len(lins))
            lins[idx] = np.asarray(v).reshape(-1)
    return conv_w, conv_b, lins


class LPIPS:
    def __init__(self, weights_path: Optional[str] = None):
        self.net = _VGG16Features()
        dummy = jnp.zeros((1, 64, 64, 3))
        self.params = self.net.init(jax.random.key(0), dummy)
        self.lin_weights = None  # per-layer (C,) channel weights
        if weights_path:
            self._load_torch_weights(weights_path)

    def _load_torch_weights(self, path: str) -> None:
        """Load calibrated weights from either a combined .npz produced by
        scripts/convert_lpips_weights.py, or directly from torch-format
        checkpoints: torchvision VGG16 (`features.<i>.weight/bias`, where
        <i> indexes the nn.Sequential INCLUDING ReLU/pool slots — convs are
        at 0,2,5,7,10,... so they must be taken in sorted order, not by
        index value) and/or LPIPS/taming layout (`lin<k>.model.1.weight`,
        the reference's shipped vgg.pth contains exactly these five)."""
        if str(path).endswith(".npz"):
            data = np.load(path)
            self._install(
                {int(k.split("_")[1]): data[k] for k in data.files if k.startswith("conv_") and k.endswith("_kernel")},
                {int(k.split("_")[1]): data[k] for k in data.files if k.startswith("conv_") and k.endswith("_bias")},
                {int(k.split("_")[1]): data[k] for k in data.files if k.startswith("lin_")},
            )
            return
        import torch

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        self._install(*parse_torch_lpips_sd(sd))

    def _install(self, conv_w: dict, conv_b: dict, lins: dict) -> None:
        params = jax.device_get(self.params)
        tree = params["params"]
        for i, key in enumerate(sorted(tree, key=lambda s: int(s[4:]))):
            if i in conv_w and np.asarray(conv_w[i]).shape == tree[key]["kernel"].shape:
                tree[key]["kernel"] = np.asarray(conv_w[i])
                if i in conv_b:
                    tree[key]["bias"] = np.asarray(conv_b[i])
        self.params = jax.device_put(params)
        if lins:
            self.lin_weights = [jnp.asarray(lins[k]) for k in sorted(lins)]

    def _features(self, x: jnp.ndarray):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        b, h, w, c = x.shape
        if h < 64 or w < 64:  # VGG has 4 pools; avoid zero-size feature maps
            x = jax.image.resize(x, (b, max(h, 64), max(w, 64), c), "linear")
        x = 2.0 * x - 1.0  # [0,1] -> [-1,1]
        x = (x - _SHIFT) / _SCALE
        return self.net.apply(self.params, x)

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 1|3) pair -> (B,) distances."""
        fa, fb = self._features(a), self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = (_normalize(xa) - _normalize(xb)) ** 2
            if self.lin_weights is not None and i < len(self.lin_weights):
                d = d * self.lin_weights[i][None, None, None, :]
            total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
        return total


def lpips_three_view(metric: LPIPS, vol_a: jnp.ndarray, vol_b: jnp.ndarray) -> jnp.ndarray:
    """Mean LPIPS over the three orthogonal mid-slices of (D, H, W) volumes
    (sample_diffusion.py:461-473)."""
    d, h, w = vol_a.shape
    pairs = [
        (vol_a[d // 2], vol_b[d // 2]),
        (vol_a[:, h // 2], vol_b[:, h // 2]),
        (vol_a[:, :, w // 2], vol_b[:, :, w // 2]),
    ]
    vals = [metric(a[None, ..., None], b[None, ..., None])[0] for a, b in pairs]
    return jnp.mean(jnp.asarray(vals))
