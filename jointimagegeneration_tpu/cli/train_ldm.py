"""Stage-2 training CLI (latentdiffusion/main.py equivalent).

    python -m jointimagegeneration_tpu.cli.train_ldm <config.yml> <exp_name> [k=v ...]

Learning rate follows the reference scaling rule (main.py:772-776)
lr = accumulate * total-samples-per-step * base_lr — here batch_size is
the global batch, so no separate device-count factor — unless
`scale_lr: false`.
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
from ..data.loader import DataLoader
from ..parallel.mesh import make_mesh_for_batch, replicate
from ..train import (
    EMATrainState,
    build_optimizer,
    make_latent_ldm_train_step,
    make_ldm_train_step,
)
from ..train.trainer import Trainer, TrainerConfig
from .common import (
    LATENT_SCALE_FILE,
    build_latent_ldm,
    build_slice_dataset,
    build_slice_ldm,
    maybe_init_from,
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg_path, exp = argv[0], (argv[1] if len(argv) > 1 else "exp")
    cfg = load_yaml_config(cfg_path, overrides=argv[2:])
    model_cfg = cfg.get("model", cfg)

    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_persistent_compile_cache()
    mesh = make_mesh_for_batch(cfg.get("batch_size", 1))
    model = build_slice_ldm(model_cfg)
    train_ds = build_slice_dataset(cfg, "train")
    size = tuple(cfg.get("dataset", {}).get("slice_shape", (512, 512)))[0]

    # latent (`_ae`) training: a first_stage section routes the batch
    # through frozen AEs inside the train step and the UNet trains at
    # latent size (the reference's ruijin-ldm_from_controlnet_ae.yaml +
    # ddpm.py:662-741 get_input path)
    logdir = Path(cfg.get("output_path", "runs")) / exp
    latent, ae_params, cond_ae_params, size = build_latent_ldm(model_cfg, model, size)
    if latent is not None:
        ae, cond_ae = latent.first_stage, latent.cond_stage
        if model_cfg.get("scale_by_std", False):
            # calibrate once from the first training batch
            # (ddpm.py:484-499 on_train_batch_start)
            calib = jnp.stack([
                jnp.asarray(train_ds[i]["image"])
                for i in range(min(len(train_ds), cfg.get("batch_size", 1)))
            ])
            latent = latent.calibrate_scale_factor(ae_params, calib)
            print(f"scale_by_std: calibrated scale_factor={latent.scale_factor:.4f}")
            # persist next to the checkpoints so sample/serve resolve the
            # SAME scale the UNet trained in (the reference keeps
            # scale_factor inside its checkpoint)
            import json

            ckdir = logdir / "checkpoints"
            ckdir.mkdir(parents=True, exist_ok=True)
            (ckdir / LATENT_SCALE_FILE).write_text(
                json.dumps({"scale_factor": latent.scale_factor}))

    batch_size = cfg.get("batch_size", 1)
    accumulate = cfg.get("accumulate_grad_batches", 1)
    base_lr = model_cfg.get("base_learning_rate", 2e-6)
    lr = base_lr
    if cfg.get("scale_lr", True):
        # reference rule (main.py:772-776): lr = accum * n_gpus * per-gpu
        # batch * base = accum * total samples/step * base.  Here
        # `batch_size` is already the GLOBAL batch (one loader batch
        # sharded over the mesh), so it must NOT be multiplied by the
        # device count again.
        lr = accumulate * batch_size * base_lr

    loader = DataLoader(
        train_ds, batch_size, seed=cfg.get("seed", 0),
        sharding=NamedSharding(mesh, P("data")), num_workers=cfg.get("num_workers", 2),
    )
    total_steps = cfg.get("max_steps", 100_000)
    # optional LR schedule (the reference's scheduler_config LambdaLR,
    # ddpm.py:93-95,356-360): model.scheduler: {type: warmup-linear|
    # warmup-cosine|warmup-cosine2, params: {...}} — f multiplies base lr
    sched_cfg = model_cfg.get("scheduler") or {}
    tx = build_optimizer(
        "AdamW", lr, lr_function=sched_cfg.get("type"),
        lr_params=sched_cfg.get("params"),
        total_steps=total_steps, accumulate_steps=accumulate)
    # learned per-timestep logvar joins the optimizer from config
    # (ddpm.py:111-115, 423: learn_logvar + logvar_init)
    params = model.init_params(
        jax.random.key(cfg.get("seed", 0)), size,
        learn_logvar=bool(model_cfg.get("learn_logvar", False)),
        logvar_init=float(model_cfg.get("logvar_init", 0.0)),
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"stage-2 UNet params: {n_params/1e6:.2f}M, lr={lr:.2e}")
    # ckpt_path/ignore_keys finetune route (the flagship config is
    # literally "from_controlnet" — ddpm.py:187-203 surgery)
    params = maybe_init_from(cfg, params, resume_key="resume")
    # LitEma warmup decay semantics (ldm/modules/ema.py:33-35)
    state = EMATrainState.create(params, tx, ema_decay=0.9999, ema_warmup=True,
                                 skip_nonfinite=True)
    step_kw = dict(
        loss_type=model_cfg.get("loss_type", "l2"),
        l_simple_weight=model_cfg.get("l_simple_weight", 1.0),
        elbo_weight=model_cfg.get("original_elbo_weight", 0.0),
    )
    if latent is not None:
        step_fn = make_latent_ldm_train_step(latent, ae_params, cond_ae_params, **step_kw)
    else:
        step_fn = make_ldm_train_step(model, **step_kw)

    # ImageLogger parity (main.py:419-449): periodic qualitative panels
    # from SliceLDM.log_images (samples / denoise row / inpaint / outpaint) + val loss
    from ..diffusion.ddim import DDIMParams

    val_ds = build_slice_dataset(cfg, "val")
    # clamp for tiny-T test configs: the reference's +1 subset convention
    # (util.py:46-62) indexes alphas_cumprod[T] when S == T
    log_ddim = DDIMParams.create(
        model.diffusion,
        min(cfg.get("log_ddim_steps", 20), max(1, model.diffusion.num_timesteps // 2)),
        eta=cfg.get("ddim_eta", 0.0),
    )

    def eval_fn(state, step, logger):
        n = min(len(val_ds), cfg.get("n_log_images", 2))
        items = [val_ds[i] for i in range(n)]
        batch = {
            k: jnp.stack([jnp.asarray(it[k]) for it in items])
            for k in items[0]
            if not isinstance(items[0][k], str) and k in ("image", "cond")
        }
        if latent is not None:
            # latent path: panels in pixel space (decode), loss in latent
            # space — the monitored quantity the reference trains on
            z, cond_z = latent.train_loss_inputs(
                ae_params, None, batch["image"], batch.get("cond"),
                cond_ae_params=cond_ae_params)
            recon = latent.decode(ae_params, z)
            samples = latent.sample_slice(
                state.ema_params, ae_params, jax.random.key(step),
                batch.get("cond", jnp.zeros(
                    batch["image"].shape[:-1] + ((cond_ae or ae).in_channels,))),
                log_ddim, cond_ae_params=cond_ae_params)
            if logger:
                from ..eval.writers import image_volume_to_grid

                for name, img in (("inputs", batch["image"]),
                                  ("reconstruction", recon), ("samples", samples)):
                    logger.image(step, f"val/{name}", image_volume_to_grid(img[..., 0]))
            diff = model.diffusion
            t = jnp.full((z.shape[0],), diff.num_timesteps // 2, jnp.int32)
            noise = jax.random.normal(jax.random.key(step + 1), z.shape)
            eps = model.apply_model(state.ema_params, diff.q_sample(z, t, noise), t, cond=cond_z)
            val_loss = float(jnp.mean((eps - noise) ** 2))
            if logger:
                logger.scalars(step, {"loss_simple": val_loss}, prefix="val/")
            return -val_loss
        panels = model.log_images(state.ema_params, jax.random.key(step), batch, log_ddim,
                                  progressive=bool(cfg.get("log_progressive", False)))
        if logger:
            from ..eval.writers import image_volume_to_grid

            for name in ("inputs", "samples", "inpaint", "outpaint"):
                logger.image(step, f"val/{name}", image_volume_to_grid(panels[name][..., 0]))
            for row in ("denoise_row", "progressive_row"):
                if row in panels:
                    logger.image(step, f"val/{row}",
                                 image_volume_to_grid(panels[row][:, 0, ..., 0]))
            if "cond" in batch and batch["cond"].shape[-1] == 2:
                # exactly the medical [prev slice, mask slice] contract —
                # other cond layouts (e.g. SR's 3-channel LR) are not masks
                # mask-over-sample alpha overlay, the reference ImageLogger's
                # qualitative artifact (combine_mask_and_im, main.py:28-67);
                # cond channel 1 carries labels/(C-1) (datasets.py SlicePair)
                import numpy as np

                from ..data.classes import NUM_CLASSES
                from ..eval.writers import make_grid, overlay_mask_on_image

                # num_classes lives at the TOP level of train configs (the
                # same place build_slice_dataset's nnunet route reads it)
                nc = int(cfg.get("num_classes",
                                 cfg.get("dataset", {}).get("num_classes", NUM_CLASSES)))
                labels = np.rint(np.asarray(batch["cond"][..., 1], np.float32)
                                 * (nc - 1)).astype(np.int64)
                samples01 = np.clip(np.asarray(panels["samples"][..., 0]), 0, 1)  # window-norm range
                # one overlay PER SAMPLE (2D sobel each): the batch axis is
                # NOT a z axis — a volume-level call would bleed each
                # sample's mask boundaries into its neighbors' panels
                logger.image(step, "val/overlay", make_grid(
                    [overlay_mask_on_image(samples01[i], labels[i])
                     for i in range(samples01.shape[0])]))
        # val loss on the logged batch (monitor val/loss_simple parity)
        diff = model.diffusion
        t = jnp.full((batch["image"].shape[0],), diff.num_timesteps // 2, jnp.int32)
        noise = jax.random.normal(jax.random.key(step + 1), batch["image"].shape)
        x_noisy = diff.q_sample(jnp.asarray(batch["image"]), t, noise)
        y = batch.get("y", batch.get("class_label"))  # adm class ids, as in training
        out = model.apply_model(state.ema_params, x_noisy, t, cond=batch.get("cond"), y=y)
        target = noise if diff.parameterization == "eps" else jnp.asarray(batch["image"])
        val_loss = float(jnp.mean((out - target) ** 2))
        if logger:
            logger.scalars(step, {"loss_simple": val_loss}, prefix="val/")
        return -val_loss  # higher-is-better score for best-checkpoint keeping

    with mesh:
        state = replicate(mesh, state)
        trainer = Trainer(
            TrainerConfig(
                logdir=str(logdir),
                max_steps=total_steps,
                log_every=cfg.get("display_freq", 50),
                save_every=cfg.get("save_freq", 1000),
                eval_every=cfg.get("eval_every", 5000),
                save_weights_every=cfg.get("save_weights_every"),
                profile_steps=int(cfg.get("profile_steps", 0) or 0),
                seed=cfg.get("seed", 0),
            ),
            state, step_fn, loader,
            eval_fn=eval_fn if cfg.get("validate", True) else None,
            resume=bool(cfg.get("resume")),
            run_config=cfg,
        )
        trainer.fit()


if __name__ == "__main__":
    main()
