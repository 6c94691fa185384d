"""First-stage autoencoder training CLI (the `_ae` config capability:
AutoencoderKL + PatchGAN, latentdiffusion ruijin-ldm_from_controlnet_ae.yaml
+ ldm/models/autoencoder.py:385-429 dual-optimizer loop).

    python -m jointimagegeneration_tpu.cli.train_ae <config.yml> <exp_name> [k=v ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import load_yaml_config
from ..core.runtime import enable_persistent_compile_cache
from ..core.checkpoint import CheckpointManager
from ..core.logging import MetricLogger, Throughput
from ..data.loader import DataLoader
from ..models.autoencoder import AutoencoderKL
from ..nn.discriminators import PatchDiscriminator
from ..parallel.mesh import is_chief, make_mesh_for_batch, replicate
from ..train import build_optimizer
from ..train.gan import GANTrainState, make_autoencoder_train_step
from .common import build_slice_dataset, maybe_init_from


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg_path, exp = argv[0], (argv[1] if len(argv) > 1 else "exp")
    cfg = load_yaml_config(cfg_path, overrides=argv[2:])
    m = cfg.get("model", {})
    dd = m.get("ddconfig", {})
    loss_cfg = m.get("lossconfig", {})

    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_persistent_compile_cache()
    mesh = make_mesh_for_batch(cfg.get("batch_size", 1))
    dims = dd.get("dims", 2)
    # `model.type: vq` trains the VQGAN variant (reference VQModel +
    # vqperceptual.py loss) with the same dual-optimizer loop
    is_vq = m.get("type", "kl") == "vq"
    common = dict(
        embed_dim=m.get("embed_dim", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        z_channels=dd.get("z_channels", 4),
        in_channels=dd.get("in_channels", 1),
        out_ch=dd.get("out_ch", 1),
        dims=dims,
        dropout=dd.get("dropout", 0.0),
        resolution=dd.get("resolution", 512),
        attn_type="linear" if dd.get("use_linear_attn") else dd.get("attn_type", "vanilla"),
    )
    if is_vq:
        from ..models.autoencoder import VQModel

        model = VQModel(n_embed=m.get("n_embed", 8192), **common)
    else:
        model = AutoencoderKL(**common)
    disc = PatchDiscriminator(dims=dims, ndf=loss_cfg.get("disc_ndf", 64), n_layers=loss_cfg.get("disc_num_layers", 3))

    size = dd.get("resolution", 512)
    shape = (1, size, size, dd.get("in_channels", 1)) if dims == 2 else (1, 16, size, size, dd.get("in_channels", 1))
    if is_vq:
        g_params = model.init(jax.random.key(0), jnp.zeros(shape))
    else:
        g_params = model.init(jax.random.key(0), jnp.zeros(shape), jax.random.key(1))
    d_params = disc.init(jax.random.key(2), jnp.zeros(shape))
    # `init_from:` finetune surgery on the generator (the reference AEs'
    # ckpt_path + ignore_keys route, ldm/models/autoencoder.py:33-47)
    g_params = maybe_init_from(cfg, g_params)
    # Lightning rule = base * n_gpus * per-gpu batch; our batch_size is the
    # GLOBAL batch sharded over the mesh, so no extra device-count factor
    lr = m.get("base_learning_rate", 4.5e-6) * cfg.get("batch_size", 1)
    g_tx = build_optimizer("Adam", lr, betas=(0.5, 0.9))
    d_tx = build_optimizer("Adam", lr, betas=(0.5, 0.9))
    state = GANTrainState.create(g_params, d_params, g_tx, d_tx)

    loss_kw = dict(
        disc_weight=loss_cfg.get("disc_weight", 0.5),
        disc_start=loss_cfg.get("disc_start", 50001),
        pixel_loss=loss_cfg.get("pixel_loss", "l1"),
        disc_loss=loss_cfg.get("disc_loss", "hinge"),
    )
    if is_vq:
        from ..train.gan import make_vq_train_step

        raw_step = make_vq_train_step(
            model, disc, codebook_weight=loss_cfg.get("codebook_weight", 1.0), **loss_kw)
    else:
        raw_step = make_autoencoder_train_step(
            model, disc, kl_weight=loss_cfg.get("kl_weight", 1e-6),
            # GAN feature-matching term of the reference 3D path
            # (contperceptual.py:234-250; config key gan_feat_weight)
            feature_matching_weight=loss_cfg.get("gan_feat_weight", 0.0),
            **loss_kw)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))

    train_ds = build_slice_dataset(cfg, "train")
    loader = DataLoader(train_ds, cfg.get("batch_size", 1), sharding=NamedSharding(mesh, P("data")))
    logdir = Path(cfg.get("output_path", "runs")) / exp
    logger = MetricLogger(logdir) if is_chief() else None
    ckpt = CheckpointManager(logdir / "checkpoints")
    tput = Throughput()
    max_steps = cfg.get("max_steps", 100_000)
    key = jax.random.key(cfg.get("seed", 0))

    step = 0
    with mesh:
        state = replicate(mesh, state)
        while step < max_steps:
            for batch in loader:
                if step >= max_steps:
                    break
                key, sub = jax.random.split(key)
                arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
                state, metrics = step_fn(state, arrays, sub)
                step += 1
                tput.update(arrays["image"].shape[0])
                if step % cfg.get("display_freq", 50) == 0 and logger:
                    vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    vals["imgs_per_sec"] = tput.rate()
                    logger.scalars(step, vals, "train/")
                    tput.reset()
                if step % cfg.get("save_freq", 1000) == 0:
                    ckpt.save(step, jax.device_get(state))
    ckpt.wait()


if __name__ == "__main__":
    main()
