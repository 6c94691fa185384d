"""I3D (Inflated Inception-V1) video feature extractor, JAX — the FVD
backbone.

The reference *calls* FVD but ships no implementation (the absent
scripts/fvd.py, imported at latentdiffusion/sample_diffusion.py:477-488);
the conventional backbone is the Kinetics-400 I3D.  This module completes
the calibration path natively: the architecture runs as pure JAX
(jittable, TPU-resident), and calibrated weights arrive offline via
scripts/convert_i3d_weights.py from any torch-format I3D checkpoint in
the standard `<Unit>.conv3d.weight` / `<Unit>.bn.*` naming (BatchNorm is
folded into per-channel scale/bias at conversion — inference only).

Output features are the time-averaged 400-way logits, the classic
TF-hub FVD convention.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["I3D_MIXED_SPEC", "i3d_features", "parse_torch_i3d_sd", "load_i3d_npz"]

# Inception-V1 mixed blocks: name -> (b0, b1a, b1b, b2a, b2b, b3b) widths.
# Branches: b0 1x1 | b1a 1x1 -> b1b 3x3 | b2a 1x1 -> b2b 3x3 |
#           maxpool3x3(s1) -> b3b 1x1; outputs channel-concatenated.
I3D_MIXED_SPEC = [
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", None),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", None),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
]

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _unit(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride=(1, 1, 1), relu: bool = True):
    """Conv3d('SAME', TF semantics) + folded-BN affine (+ ReLU)."""
    y = jax.lax.conv_general_dilated(x, p["kernel"], stride, "SAME", dimension_numbers=_DN)
    y = y * p["scale"] + p["bias"]
    return jax.nn.relu(y) if relu else y


def _maxpool(x: jnp.ndarray, window, strides):
    from flax import linen as nn

    return nn.max_pool(x, window, strides, padding="SAME")


def _mixed(x: jnp.ndarray, params: Dict, name: str) -> jnp.ndarray:
    b0 = _unit(x, params[f"{name}.b0"])
    b1 = _unit(_unit(x, params[f"{name}.b1a"]), params[f"{name}.b1b"])
    b2 = _unit(_unit(x, params[f"{name}.b2a"]), params[f"{name}.b2b"])
    b3 = _unit(_maxpool(x, (3, 3, 3), (1, 1, 1)), params[f"{name}.b3b"])
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_features(params: Dict, video: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) video in [-1, 1] -> (B, 400) time-averaged logits."""
    x = _unit(video, params["Conv3d_1a_7x7"], stride=(2, 2, 2))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(x, params["Conv3d_2b_1x1"])
    x = _unit(x, params["Conv3d_2c_3x3"])
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    for name, spec in I3D_MIXED_SPEC:
        if spec is None:
            w = (3, 3, 3) if name.endswith("3x3") else (2, 2, 2)
            x = _maxpool(x, w, (2, 2, 2))
        else:
            x = _mixed(x, params, name)
    # spatial global average per timestep, 1x1 logits conv, mean over time
    x = jnp.mean(x, axis=(2, 3), keepdims=True)  # (B, T', 1, 1, 1024)
    x = _unit(x, params["logits"], relu=False)
    return jnp.mean(x, axis=(1, 2, 3))  # (B, 400)


def parse_torch_i3d_sd(sd, eps: float = 1e-3) -> Dict[str, Dict[str, np.ndarray]]:
    """Torch I3D state dict -> {unit: {kernel DHWIO, scale, bias}} with BN
    folded (y = gamma*(x-mean)/sqrt(var+eps)+beta == scale*conv+bias).
    Accepts the standard `<Unit>.conv3d.weight` (+ optional `.conv3d.bias`)
    and `<Unit>.bn.{weight,bias,running_mean,running_var}` naming; units
    without BN (the logits head) keep their conv bias directly."""
    units: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k.endswith("conv3d.weight"):
            unit = k[: -len(".conv3d.weight")]
            w = np.asarray(v, np.float32)  # OIDHW
            kern = np.transpose(w, (2, 3, 4, 1, 0))  # -> DHWIO
            cout = kern.shape[-1]
            scale = np.ones((cout,), np.float32)
            bias = np.zeros((cout,), np.float32)
            bk = f"{unit}.conv3d.bias"
            if bk in sd:
                bias = np.asarray(sd[bk], np.float32)
            if f"{unit}.bn.running_var" in sd:
                gamma = np.asarray(sd.get(f"{unit}.bn.weight", scale), np.float32)
                beta = np.asarray(sd.get(f"{unit}.bn.bias", bias * 0), np.float32)
                mean = np.asarray(sd[f"{unit}.bn.running_mean"], np.float32)
                var = np.asarray(sd[f"{unit}.bn.running_var"], np.float32)
                scale = gamma / np.sqrt(var + eps)
                bias = beta - mean * scale + bias * scale
            units[unit] = {"kernel": kern, "scale": scale, "bias": bias}
    return units


def load_i3d_npz(path) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Load scripts/convert_i3d_weights.py output into i3d_features params."""
    raw = np.load(path)
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in raw.files:
        unit, leaf = key.rsplit("/", 1)
        params.setdefault(unit, {})[leaf] = jnp.asarray(raw[key])
    return params
