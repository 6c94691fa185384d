"""DPM-Solver++(2M) sampler (beyond-reference; diffusion/dpm_solver.py).

Correctness is pinned three ways: a bit-level closed form (zero-eps head
telescopes exactly like DDIM, because the x0-prediction is constant along
the trajectory), order-2 accuracy against a many-step DDIM ODE reference
(DPM at S steps must land closer than DDIM at S steps), and end-to-end
volume/CLI routing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM


def _tiny_ldm(timesteps=1000):
    return SliceLDM.create(timesteps=timesteps, model_channels=8, channel_mult=(1, 2),
                           attention_resolutions=(), num_res_blocks=1, num_head_channels=4)


def _randomize_head(params, scale=0.05):
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(jax.random.key(9), p.shape) * scale
        if any(getattr(k, "key", None) == "out_conv" for k in path) else p,
        params,
    )


def test_dpm_zero_eps_telescopes():
    """With e_t ≡ 0 (fresh zero-init out_conv) the x0-prediction D_i =
    x_{t_i}/alpha_{t_i} is CONSTANT along the trajectory, so both the
    first-order and 2M updates reduce to x -> x·alpha_next/alpha_cur and
    the whole chain telescopes to x·sqrt(alphas_prev[0]/alphas[S-1]) —
    the same closed form as the DDIM eta=0 chain.  Any error in the
    lambda/expm1 algebra or the node sequence breaks this."""
    ldm = _tiny_ldm(timesteps=20)
    params = ldm.init_params(jax.random.key(0), 16)
    cond = jnp.zeros((1, 16, 16, 2))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    for s in (1, 2, 5):
        ddim = DDIMParams.create(ldm.diffusion, s)
        out = ldm.sample_slice_dpm(params, jax.random.key(2), cond, ddim, x_T=x)
        expect = x * jnp.sqrt(ddim.alphas_prev[0] / ddim.alphas[s - 1])
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=2e-5)


def test_dpm_second_order_beats_ddim():
    """Both DDIM (eta=0) and DPM-Solver++ discretise the same probability-
    flow ODE, so a fine DDIM chain is a near-exact reference solution.

    Node spacing matters: uniform-in-t subsets concentrate the log-SNR
    span at the chain endpoints, capping EVERY solver at first order
    there (measured: DPM == DDIM to 3 digits on uniform-t nodes).  On
    uniform-lambda nodes the second order pays off — DPM's distance to
    the reference must be well below DDIM's at the SAME step count, and
    uniform-lambda DDIM itself must beat uniform-t DDIM."""
    ldm = _tiny_ldm(timesteps=1000)
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16), scale=0.2)
    cond = jnp.ones((1, 16, 16, 2)) * 0.3
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))

    ref = ldm.sample_slice(params, jax.random.key(2), cond,
                           DDIMParams.create(ldm.diffusion, 200, method="uniform_lambda"),
                           x_T=x)
    ref = np.asarray(ref)

    for s in (10, 20):
        dd = DDIMParams.create(ldm.diffusion, s, method="uniform_lambda")
        ddim_err = np.abs(np.asarray(
            ldm.sample_slice(params, jax.random.key(2), cond, dd, x_T=x)) - ref).mean()
        dpm_err = np.abs(np.asarray(
            ldm.sample_slice_dpm(params, jax.random.key(2), cond, dd, x_T=x)) - ref).mean()
        # measured ratios: 0.456 (S=10), 0.234 (S=20) — assert with margin
        assert dpm_err < 0.7 * ddim_err, (
            f"S={s}: dpm_err={dpm_err:.5f} not < 0.7*ddim_err={ddim_err:.5f}")
        ddim_t_err = np.abs(np.asarray(
            ldm.sample_slice(params, jax.random.key(2), cond,
                             DDIMParams.create(ldm.diffusion, s), x_T=x)) - ref).mean()
        assert ddim_err < ddim_t_err


def test_uniform_lambda_subset_properties():
    from jointimagegeneration_tpu.ops import schedules as sched
    import numpy as onp

    ldm = _tiny_ldm(timesteps=1000)
    ac = onp.asarray(ldm.diffusion.alphas_cumprod, onp.float64)
    for s in (5, 20, 50):
        sub = sched.ddim_timestep_subset("uniform_lambda", s, 1000, alphas_cumprod=ac)
        assert len(sub) == s == len(onp.unique(sub))
        assert sub.min() >= 1 and sub.max() <= 999  # +1 offset stays in bounds
        assert onp.all(onp.diff(sub) > 0)
    with pytest.raises(ValueError):
        sched.ddim_timestep_subset("uniform_lambda", 5, 1000)  # needs alphas_cumprod
    with pytest.raises(ValueError):  # only T-1 candidate nodes exist
        sched.ddim_timestep_subset("uniform_lambda", 1000, 1000, alphas_cumprod=ac)
    assert len(sched.ddim_timestep_subset("uniform_lambda", 999, 1000,
                                          alphas_cumprod=ac)) == 999
    # lambda spacing is near-uniform mid-chain
    sub = sched.ddim_timestep_subset("uniform_lambda", 20, 1000, alphas_cumprod=ac)
    lam = 0.5 * (onp.log(ac[sub]) - onp.log1p(-ac[sub]))
    dl = onp.abs(onp.diff(lam))
    assert dl.max() / dl.min() < 3.0


def test_sampler_validation():
    ldm = _tiny_ldm(timesteps=20)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 4)
    mask = jnp.ones((1, 2, 16, 16, 1)) * 0.5
    with pytest.raises(ValueError):
        ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="euler")
    with pytest.raises(ValueError):
        ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm",
                          tile=((8, 8), (8, 8)))
    with pytest.raises(ValueError):
        ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="plms",
                          tile=((8, 8), (8, 8)))


def test_multistep_start_index_telescopes_and_validates():
    """Truncated dpm/plms chains with e_t ≡ 0 (zero-init out_conv) reduce
    every step to x -> x·sqrt(a_next/a_cur), so a chain started at subset
    index k telescopes to x·sqrt(alphas_prev[0]/alphas[k-1]) — pins the
    start_index plumbing (node range, first-order restart) exactly.  A
    full-length start_index must be the default chain bit-for-bit."""
    from jointimagegeneration_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
    from jointimagegeneration_tpu.diffusion.plms import plms_sample_loop

    ldm = _tiny_ldm(timesteps=20)
    params = ldm.init_params(jax.random.key(0), 16)
    ddim = DDIMParams.create(ldm.diffusion, 5)
    cond = jnp.zeros((1, 16, 16, 2))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 1))
    for loop in (dpm_solver_sample_loop, plms_sample_loop):
        eps_fn = lambda xx, tt: jnp.zeros_like(xx)
        for k in (1, 3, 5):
            out = loop(eps_fn, ddim, x, start_index=k)
            expect = x * jnp.sqrt(ddim.alphas_prev[0] / ddim.alphas[k - 1])
            np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=2e-5)
        full = loop(eps_fn, ddim, x)
        k_full = loop(eps_fn, ddim, x, start_index=ddim.num_steps)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(k_full))
        with pytest.raises(ValueError):
            loop(eps_fn, ddim, x, start_index=0)
        with pytest.raises(ValueError):
            loop(eps_fn, ddim, x, start_index=6)


@pytest.mark.slow
def test_dpm_volume_stream_and_cfg():
    """sample_volume(sampler='dpm') streams bit-identically, composes with
    CFG (traced scale, one program), and differs from the DDIM route."""
    ldm = _tiny_ldm(timesteps=20)
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16))
    ddim = DDIMParams.create(ldm.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    vol = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm")
    assert vol.shape == (1, 3, 16, 16, 1) and np.isfinite(np.asarray(vol)).all()
    ddim_vol = ldm.sample_volume(params, jax.random.key(1), mask, ddim)
    assert np.abs(np.asarray(vol) - np.asarray(ddim_vol)).max() > 0
    streamed = jnp.stack(
        list(ldm.stream_volume(params, jax.random.key(1), mask, ddim, sampler="dpm")),
        axis=1)
    np.testing.assert_array_equal(np.asarray(vol), np.asarray(streamed))
    cfg_vol = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm",
                                guidance_scale=2.0)
    assert np.isfinite(np.asarray(cfg_vol)).all()
    assert np.abs(np.asarray(cfg_vol) - np.asarray(vol)).max() > 0
    # plms rides the same multistep volume route
    plms_vol = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="plms")
    assert np.isfinite(np.asarray(plms_vol)).all()
    assert np.abs(np.asarray(plms_vol) - np.asarray(vol)).max() > 0


@pytest.mark.slow
def test_dpm_warm_start_composes():
    """warm_start + sampler='dpm' compounds the two speed knobs: slice 0
    runs the full solver chain (bit-identical to the cold dpm route),
    later slices run only the last round(f·S) nodes from the q-noised
    previous slice.  Streaming shares _volume_slice_step so it must match
    bit-for-bit; CFG extends the same carries."""
    ldm = _tiny_ldm(timesteps=20)
    params = _randomize_head(ldm.init_params(jax.random.key(0), 16))
    ddim = DDIMParams.create(ldm.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    cold = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm")
    warm = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm",
                             warm_start=0.5)
    assert warm.shape == (1, 3, 16, 16, 1) and np.isfinite(np.asarray(warm)).all()
    np.testing.assert_array_equal(np.asarray(cold[:, 0]), np.asarray(warm[:, 0]))
    assert np.abs(np.asarray(cold[:, 1:]) - np.asarray(warm[:, 1:])).max() > 0
    streamed = jnp.stack(
        list(ldm.stream_volume(params, jax.random.key(1), mask, ddim, sampler="dpm",
                               warm_start=0.5)), axis=1)
    np.testing.assert_array_equal(np.asarray(warm), np.asarray(streamed))
    warm_cfg = ldm.sample_volume(params, jax.random.key(1), mask, ddim, sampler="dpm",
                                 warm_start=0.5, guidance_scale=2.0)
    assert np.isfinite(np.asarray(warm_cfg)).all()
    assert np.abs(np.asarray(warm_cfg) - np.asarray(warm)).max() > 0
    # plms rides the same composed route
    warm_plms = ldm.sample_volume(params, jax.random.key(1), mask, ddim,
                                  sampler="plms", warm_start=0.5)
    assert np.isfinite(np.asarray(warm_plms)).all()


@pytest.mark.slow
def test_latent_volume_dpm():
    from jointimagegeneration_tpu.models.autoencoder import AutoencoderKL
    from jointimagegeneration_tpu.models.latent_ldm import LatentSliceLDM

    fs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=1, out_ch=1,
                       resolution=16)
    cs = AutoencoderKL(embed_dim=2, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), z_channels=2, in_channels=2, out_ch=2,
                       resolution=16)
    model = LatentSliceLDM(
        inner=SliceLDM.create(
            image_channels=2, cond_channels=2, timesteps=20, model_channels=8,
            channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
            num_head_channels=4),
        first_stage=fs, cond_stage=cs, scale_factor=1.0)
    fs_params = fs.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    cs_params = cs.init(jax.random.key(2), jnp.zeros((1, 16, 16, 2)), jax.random.key(3))
    params = model.inner.init_params(jax.random.key(4), 8)
    ddim = DDIMParams.create(model.diffusion, 4)
    mask = jnp.ones((1, 3, 16, 16, 1)) * 0.5
    vol = model.sample_volume(params, fs_params, jax.random.key(3), mask, ddim,
                              cond_ae_params=cs_params, sampler="dpm")
    assert vol.shape == (1, 3, 16, 16, 1) and np.isfinite(np.asarray(vol)).all()
    streamed = jnp.stack(
        list(model.stream_volume(params, fs_params, jax.random.key(3), mask, ddim,
                                 cond_ae_params=cs_params, sampler="dpm")), axis=1)
    np.testing.assert_allclose(np.asarray(vol), np.asarray(streamed), atol=2e-5)
    # warm_start composes on the LATENT route too: slice 0 is the same full
    # chain (same math; allclose not bit-equal because the warm path unrolls
    # slice 0 out of the scan → a differently-fused program), later slices
    # run the truncated solver from the q-noised previous LATENT
    warm = model.sample_volume(params, fs_params, jax.random.key(3), mask, ddim,
                               cond_ae_params=cs_params, sampler="dpm",
                               warm_start=0.5)
    assert np.isfinite(np.asarray(warm)).all()
    np.testing.assert_allclose(np.asarray(vol[:, 0]), np.asarray(warm[:, 0]),
                               atol=1e-5)
    assert np.abs(np.asarray(vol[:, 1:]) - np.asarray(warm[:, 1:])).max() > 1e-3


@pytest.mark.slow
def test_sampler_config_key_ct_cli(tmp_path):
    """`sampler: dpm` + `warm_start` in the sample config route end to end
    (stage: ct) — the composed beyond-reference knobs at the CLI surface."""
    from jointimagegeneration_tpu.cli import sample as sample_cli

    cfg = {
        "stage": "ct", "n_cases": 1, "ddim_steps": 4, "seed": 5, "metrics": False,
        "output_path": str(tmp_path / "samples"),
        "sampler": "dpm", "warm_start": 0.5,
        "stage2": {
            "timesteps": 8, "bf16": False, "slice_size": 16,
            "unet": {"model_channels": 8, "channel_mult": [1, 2], "attention_resolutions": [],
                     "num_res_blocks": 1, "num_head_channels": 4},
            "dataset": {"kind": "synthetic", "num_cases": 2, "slice_shape": [16, 16], "depth": 3},
        },
    }
    p = tmp_path / "ct_dpm.yml"
    p.write_text(yaml.safe_dump(cfg))
    sample_cli.main([str(p)])
    from jointimagegeneration_tpu.data import read_nifti

    vol, _ = read_nifti(tmp_path / "samples" / "case_0000" / "image.nii.gz")
    vol = np.asarray(vol, np.float32)
    assert vol.shape == (3, 16, 16) and np.all(np.isfinite(vol))
