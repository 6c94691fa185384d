"""Golden parity for the FVD backbone: the JAX I3D (eval/i3d.py) fed
through the scripts/convert_i3d_weights.py parser must reproduce a torch
implementation of Inflated Inception-V1 (TF-SAME padding, eval-mode BN)
to fp32 tolerance on the same random weights — the same calibration-path
proof pattern as tests/test_lpips_golden.py.  With a real Kinetics-400
checkpoint the identical path yields published-comparable FVD scores."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from jointimagegeneration_tpu.eval.i3d import (  # noqa: E402
    I3D_MIXED_SPEC,
    i3d_features,
    parse_torch_i3d_sd,
)

_BN_EPS = 1e-3


def _torch_units():
    """(name, cin, cout, k, has_bn) for every conv unit, channels threaded."""
    units = [("Conv3d_1a_7x7", 3, 64, 7, True),
             ("Conv3d_2b_1x1", 64, 64, 1, True),
             ("Conv3d_2c_3x3", 64, 192, 3, True)]
    cin = 192
    for name, spec in I3D_MIXED_SPEC:
        if spec is None:
            continue
        b0, b1a, b1b, b2a, b2b, b3b = spec
        units += [(f"{name}.b0", cin, b0, 1, True),
                  (f"{name}.b1a", cin, b1a, 1, True), (f"{name}.b1b", b1a, b1b, 3, True),
                  (f"{name}.b2a", cin, b2a, 1, True), (f"{name}.b2b", b2a, b2b, 3, True),
                  (f"{name}.b3b", cin, b3b, 1, True)]
        cin = b0 + b1b + b2b + b3b
    units.append(("logits", cin, 400, 1, False))
    return units


def _random_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, cin, cout, k, has_bn in _torch_units():
        fan_in = cin * k ** 3
        sd[f"{name}.conv3d.weight"] = torch.randn(cout, cin, k, k, k, generator=g) * (2.0 / fan_in) ** 0.5
        if has_bn:
            sd[f"{name}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
            sd[f"{name}.bn.bias"] = torch.randn(cout, generator=g) * 0.1
            sd[f"{name}.bn.running_mean"] = torch.randn(cout, generator=g) * 0.1
            sd[f"{name}.bn.running_var"] = torch.rand(cout, generator=g) + 0.5
        else:
            sd[f"{name}.conv3d.bias"] = torch.randn(cout, generator=g) * 0.1
    return sd


def _tf_same_pad(x, k, s, value=0.0):
    """TF-SAME padding for NCDHW (asymmetric: extra on the high side)."""
    flat = []
    for dim, kk, ss in zip(reversed(x.shape[2:]), reversed(k), reversed(s)):
        out = -(-dim // ss)
        total = max(0, (out - 1) * ss + kk - dim)
        flat += [total // 2, total - total // 2]
    return F.pad(x, flat, value=value)


def _t_unit(x, sd, name, stride=(1, 1, 1), relu=True):
    w = sd[f"{name}.conv3d.weight"]
    k = w.shape[2:]
    y = F.conv3d(_tf_same_pad(x, k, stride), w, sd.get(f"{name}.conv3d.bias"), stride=stride)
    if f"{name}.bn.running_var" in sd:
        y = F.batch_norm(y, sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"],
                         sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"], eps=_BN_EPS)
    return F.relu(y) if relu else y


def _t_pool(x, k, s):
    return F.max_pool3d(_tf_same_pad(x, k, s, value=float("-inf")), k, s)


def _t_mixed(x, sd, name):
    b0 = _t_unit(x, sd, f"{name}.b0")
    b1 = _t_unit(_t_unit(x, sd, f"{name}.b1a"), sd, f"{name}.b1b")
    b2 = _t_unit(_t_unit(x, sd, f"{name}.b2a"), sd, f"{name}.b2b")
    b3 = _t_unit(_t_pool(x, (3, 3, 3), (1, 1, 1)), sd, f"{name}.b3b")
    return torch.cat([b0, b1, b2, b3], dim=1)


def _torch_i3d(sd, video):  # video (B, T, H, W, 3)
    x = torch.tensor(video).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        x = _t_unit(x, sd, "Conv3d_1a_7x7", stride=(2, 2, 2))
        x = _t_pool(x, (1, 3, 3), (1, 2, 2))
        x = _t_unit(x, sd, "Conv3d_2b_1x1")
        x = _t_unit(x, sd, "Conv3d_2c_3x3")
        x = _t_pool(x, (1, 3, 3), (1, 2, 2))
        for name, spec in I3D_MIXED_SPEC:
            if spec is None:
                k = (3, 3, 3) if name.endswith("3x3") else (2, 2, 2)
                x = _t_pool(x, k, (2, 2, 2))
            else:
                x = _t_mixed(x, sd, name)
        x = x.mean(dim=(3, 4), keepdim=True)  # (B, 1024, T', 1, 1)
        x = _t_unit(x, sd, "logits", relu=False)
        return x.mean(dim=(2, 3, 4)).numpy()  # (B, 400)


def test_i3d_matches_torch_replica():
    import jax.numpy as jnp

    sd = _random_sd()
    video = np.random.RandomState(0).rand(1, 9, 32, 32, 3).astype(np.float32) * 2 - 1
    want = _torch_i3d(sd, video)
    params = {u: {k: jnp.asarray(v) for k, v in leaves.items()}
              for u, leaves in parse_torch_i3d_sd(sd).items()}
    ours = np.asarray(i3d_features(params, jnp.asarray(video)))
    assert ours.shape == (1, 400)
    np.testing.assert_allclose(ours, want, atol=2e-3, rtol=2e-3)


def test_i3d_npz_roundtrip_and_fvd(tmp_path):
    """convert_i3d_weights.py output loads into i3d_npz_feature_fn and
    yields a finite, direction-consistent FVD."""
    import subprocess
    import sys

    from jointimagegeneration_tpu.eval.fvd import fvd, i3d_npz_feature_fn

    sd = _random_sd(seed=1)
    pth = tmp_path / "i3d_sd.pth"
    torch.save(sd, pth)
    out = tmp_path / "i3d.npz"
    r = subprocess.run(
        [sys.executable, "scripts/convert_i3d_weights.py", "--i3d", str(pth), "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    fn = i3d_npz_feature_fn(str(out))
    rng = np.random.RandomState(2)
    real = [rng.rand(9, 32, 32).astype(np.float32) for _ in range(3)]
    same = [v + rng.rand(9, 32, 32).astype(np.float32) * 0.01 for v in real]
    far = [1.0 - v for v in real]
    d_same = fvd(real, same, feature_fn=fn)
    d_far = fvd(real, far, feature_fn=fn)
    assert np.isfinite(d_same) and np.isfinite(d_far)
    assert d_far > d_same
