"""Stage-1 training CLI (ccdm/ddpm_train.py equivalent).

    python -m jointimagegeneration_tpu.cli.train_mask <config.yml> <exp_name> [k=v ...]

Distribution is mesh-implicit: no process spawn / backend / master_port —
run one process per host under `jax.distributed` and the batch shards
over the mesh's data axis.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import load_yaml_config
from ..core.runtime import enable_persistent_compile_cache
from ..data.loader import DataLoader
from ..eval.metrics import per_class_dice
from ..parallel.mesh import make_mesh_for_batch, replicate
from ..train import EMATrainState, build_optimizer, make_mask_train_step
from ..train.trainer import Trainer, TrainerConfig
from .common import (
    build_dino_feature_fn,
    build_mask_dataset,
    build_mask_sampler,
    maybe_init_from,
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg_path, exp = argv[0], (argv[1] if len(argv) > 1 else "exp")
    cfg = load_yaml_config(cfg_path, overrides=argv[2:])

    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_persistent_compile_cache()
    mesh = make_mesh_for_batch(cfg.get("batch_size", 1))
    model = build_mask_sampler(cfg)
    train_ds = build_mask_dataset(cfg, "train")
    spatial = tuple(cfg.get("dataset", {}).get("volume_shape", (64, 128, 128)))

    batch_size = cfg.get("batch_size", 1)
    loader = DataLoader(
        train_ds, batch_size, seed=cfg.get("seed", 0),
        sharding=NamedSharding(mesh, P("data")), num_workers=cfg.get("mp_loaders", 2),
    )

    opt_cfg = cfg.get("optim", {})
    total_steps = cfg.get("max_steps", 100_000)
    tx = build_optimizer(
        name=opt_cfg.get("name", "AdamW"),
        learning_rate=opt_cfg.get("learning_rate", 1e-3),
        lr_function=opt_cfg.get("lr_function"),
        lr_params=opt_cfg.get("lr_params"),
        total_steps=total_steps,
        grad_clip=opt_cfg.get("grad_clip"),
        lr_restarts=opt_cfg.get("lr_restarts"),
        lr_restart_vals=opt_cfg.get("lr_restart_vals", 1.0),
    )
    ctx_shape = None
    if model.refiner is not None:
        ctx_shape = (cfg.get("dataset", {}).get("context_len", 4), model.refiner.embed_dim)
    # dense DINO feature conditioning from config (feature_cond_encoder:
    # {type: dino, inject_idx: N}) — extractor frozen, features computed
    # inside the jitted step per batch (reference: per train step,
    # trainer.py:287)
    feat_fn, feat_idx, feat_shape = build_dino_feature_fn(cfg, spatial)
    params = model.init_params(
        jax.random.key(cfg.get("seed", 0)), spatial, cond_channels=1, context_shape=ctx_shape,
        feature_cond_shapes=None if feat_idx is None else {feat_idx: feat_shape},
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"stage-1 UNet params: {n_params/1e6:.2f}M")
    params = maybe_init_from(cfg, params)
    state = EMATrainState.create(params, tx, ema_decay=cfg.get("polyak_alpha", 0.9999))

    weights = cfg.get("class_weights", "uniform")
    num_classes = cfg.get("num_classes", 12)
    class_weights = jnp.ones((num_classes,)) if weights == "uniform" else jnp.asarray(weights)
    base_step = make_mask_train_step(model, class_weights, feature_inject_idx=feat_idx)
    if feat_fn is None:
        step_fn = base_step
    else:
        def step_fn(state, batch, key):
            return base_step(state, dict(batch, feature_cond=feat_fn(batch["image"])), key)

    def eval_fn(state, step, logger):
        from ..eval.writers import labels_to_grid

        ds = build_mask_dataset(cfg, "val")
        n_eval = min(len(ds), cfg.get("n_validation_images", 2))
        dices = []
        for i in range(n_eval):
            item = ds[i]
            gt = np.argmax(item["mask"], -1)
            ctx = jnp.asarray(item["context"])[None] if "context" in item else None
            img = jnp.asarray(item["image"])[None]
            fc = None if feat_fn is None else {feat_idx: feat_fn(img)}
            labels = model.sample_labels(
                state.ema_params, jax.random.key(step + i), (1, *spatial),
                cond=img, context=ctx, feature_cond=fc,
                num_steps=cfg.get("eval_time_steps", 50),
            )
            dices.append(np.asarray(per_class_dice(labels[0], jnp.asarray(gt), num_classes))[1:].mean())
            if logger and i == 0:
                # qualitative grid (ImageLogger / save_qualitative_results parity)
                logger.image(step, "val/pred", labels_to_grid(np.asarray(labels[0])))
                logger.image(step, "val/gt", labels_to_grid(gt))
        score = float(np.mean(dices))
        if logger:
            logger.scalars(step, {"dice": score}, prefix="val/")
        return score

    with mesh:
        state = replicate(mesh, state)
        trainer = Trainer(
            TrainerConfig(
                logdir=f"{cfg.get('output_path', 'runs')}/{exp}",
                max_steps=total_steps,
                log_every=cfg.get("display_freq", 50),
                save_every=cfg.get("save_freq", 1000),
                eval_every=cfg.get("validation_freq_steps", 1000),
                save_weights_every=cfg.get("save_weights_every"),
                profile_steps=int(cfg.get("profile_steps", 0) or 0),
                seed=cfg.get("seed", 0),
            ),
            state, step_fn, loader,
            eval_fn=eval_fn if cfg.get("validate", True) else None,
            resume=bool(cfg.get("load_from")),
            run_config=cfg,
        )
        trainer.fit()


if __name__ == "__main__":
    main()
