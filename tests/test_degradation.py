"""BSRGAN-light degradation parity (VERDICT r3 #9): kernel zoo oracle
checks against the reference's own bsrgan_light.py code, distributional
tests over sampled kernel parameters, and pipeline contract tests."""

import importlib.util
import sys
import types
from functools import lru_cache
from pathlib import Path

import numpy as np
import pytest

from jointimagegeneration_tpu.data.degradation import (
    anisotropic_gaussian_kernel,
    bsrgan_light_pipeline,
    get_degradation,
    isotropic_gaussian_kernel,
    sample_blur_kernel,
)

REF = Path("/root/reference")

pytestmark = pytest.mark.slow


@lru_cache(maxsize=None)
def _ref_bsrgan_light():
    """Load the reference bsrgan_light module with its unavailable
    imports stubbed (albumentations is not in this image; utils_image is
    only used by the io helpers the kernel functions never touch)."""
    pytest.importorskip("torch")
    sys.modules.setdefault("albumentations", types.ModuleType("albumentations"))
    if "torchvision" not in sys.modules:  # utils_image needs only make_grid
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    for name in ("ldm", "ldm.modules", "ldm.modules.image_degradation"):
        sys.modules.setdefault(name, types.ModuleType(name))
    util_path = REF / "latentdiffusion" / "ldm" / "modules" / "image_degradation" / "utils_image.py"
    spec = importlib.util.spec_from_file_location("ldm.modules.image_degradation.utils_image", util_path)
    util = importlib.util.module_from_spec(spec)
    sys.modules["ldm.modules.image_degradation.utils_image"] = util
    spec.loader.exec_module(util)
    path = REF / "latentdiffusion" / "ldm" / "modules" / "image_degradation" / "bsrgan_light.py"
    spec = importlib.util.spec_from_file_location("_ref_bsrgan_light", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_bsrgan_light"] = mod
    spec.loader.exec_module(mod)
    # the reference calls scipy.finfo (an alias removed in modern scipy);
    # shim just that attribute inside the loaded module's namespace
    mod.scipy = types.SimpleNamespace(finfo=np.finfo)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")
def test_anisotropic_kernel_matches_reference_oracle():
    ref = _ref_bsrgan_light()
    for ksize, theta, l1, l2 in [(15, 0.7, 4.0, 1.0), (9, 2.3, 1.5, 0.3), (12, np.pi, 2.0, 2.0)]:
        want = ref.anisotropic_Gaussian(ksize=ksize, theta=theta, l1=l1, l2=l2)
        got = anisotropic_gaussian_kernel(ksize, theta, l1, l2)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")
def test_isotropic_kernel_matches_reference_oracle():
    ref = _ref_bsrgan_light()
    for hsize, sigma in [(5, 0.4), (7, 1.3), (25, 2.0)]:
        want = ref.fspecial("gaussian", hsize, sigma)
        got = isotropic_gaussian_kernel(hsize, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_blur_kernel_parameter_distribution():
    """The sampled kernel parameters follow the reference add_blur
    distributions (bsrgan_light.py:325-340) at sf=4: half anisotropic,
    ksize ranges 5..14 (aniso) / 5..7 (iso), l ~ U(0, 2), sigma ~ U(0, 0.7)."""
    rng = np.random.default_rng(0)
    params = [sample_blur_kernel(rng, sf=4)[1] for _ in range(600)]
    kinds = [p["kind"] for p in params]
    frac_aniso = kinds.count("aniso") / len(kinds)
    assert 0.42 < frac_aniso < 0.58
    aniso = [p for p in params if p["kind"] == "aniso"]
    iso = [p for p in params if p["kind"] == "iso"]
    assert {p["ksize"] for p in aniso} <= set(range(5, 15))
    assert len({p["ksize"] for p in aniso}) >= 8  # covers most of the range
    assert {p["ksize"] for p in iso} <= {5, 6, 7}
    wd2 = (4 + 4) / 4.0  # 2.0
    wd = (2 + 0.2 * 4) / 4.0  # 0.7
    assert max(max(p["l1"], p["l2"]) for p in aniso) <= wd2
    assert max(max(p["l1"], p["l2"]) for p in aniso) > 0.8 * wd2  # fills the range
    assert all(0 <= p["theta"] <= np.pi for p in aniso)
    assert max(p["sigma"] for p in iso) <= wd
    assert max(p["sigma"] for p in iso) > 0.8 * wd
    # every sampled kernel is a valid normalized PSF
    rng2 = np.random.default_rng(1)
    for _ in range(25):
        k, _p = sample_blur_kernel(rng2, sf=4)
        assert k.min() >= 0 and abs(k.sum() - 1.0) < 1e-6


def test_anisotropic_kernel_orientation():
    """The principal axis of the kernel's second-moment matrix follows
    theta, and its eigenvalue ratio follows l1/l2."""
    k = anisotropic_gaussian_kernel(25, 0.7, 4.0, 1.0)
    coords = np.arange(25) - (25 / 2.0 + 0.5) + 1
    cx, cy = np.meshgrid(coords, coords)
    cov = np.array([
        [np.sum(k * cx * cx), np.sum(k * cx * cy)],
        [np.sum(k * cx * cy), np.sum(k * cy * cy)],
    ])
    evals, evecs = np.linalg.eigh(cov)
    # largest eigenvalue ~ l1=4, smallest ~ l2=1 (grid-discretized)
    assert evals[1] == pytest.approx(4.0, rel=0.1)
    assert evals[0] == pytest.approx(1.0, rel=0.1)
    ang = np.arctan2(evecs[1, 1], evecs[0, 1]) % np.pi
    assert ang == pytest.approx(0.7, abs=0.05)


def test_bsrgan_light_pipeline_contract():
    """(H, W, C) HR -> LR at exactly H/sf with values in [0,1]; the HR
    returned is the mod-cropped original.  Both 3-channel and grayscale
    (medical) images run."""
    rng = np.random.default_rng(2)
    for c in (3, 1):
        hr = rng.random((67, 70, c)).astype(np.float32)
        for seed in range(4):  # different shuffled stage orders
            lr, hq = bsrgan_light_pipeline(hr, np.random.default_rng(seed), sf=4)
            assert hq.shape == (64, 68, c)
            assert lr.shape == (16, 17, c)
            assert lr.min() >= 0.0 and lr.max() <= 1.0
    assert get_degradation("bsrgan_light") is bsrgan_light_pipeline
