"""Stage-2 training CLI (latentdiffusion/main.py equivalent).

    python -m jointimagegeneration_tpu.cli.train_ldm <config.yml> <exp_name> [k=v ...]

Learning rate follows the reference scaling rule
lr = accumulate * n_devices * batch_size * base_lr (main.py:772-776)
unless `scale_lr: false`.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import load_yaml_config
from ..data.loader import DataLoader
from ..parallel.mesh import make_mesh, replicate
from ..train import EMATrainState, build_optimizer, make_ldm_train_step
from ..train.trainer import Trainer, TrainerConfig
from .common import build_slice_dataset, build_slice_ldm


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg_path, exp = argv[0], (argv[1] if len(argv) > 1 else "exp")
    cfg = load_yaml_config(cfg_path, overrides=argv[2:])
    model_cfg = cfg.get("model", cfg)

    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    mesh = make_mesh()
    model = build_slice_ldm(model_cfg)
    train_ds = build_slice_dataset(cfg, "train")
    size = tuple(cfg.get("dataset", {}).get("slice_shape", (512, 512)))[0]

    batch_size = cfg.get("batch_size", 1)
    accumulate = cfg.get("accumulate_grad_batches", 1)
    base_lr = model_cfg.get("base_learning_rate", 2e-6)
    lr = base_lr
    if cfg.get("scale_lr", True):
        lr = accumulate * jax.device_count() * batch_size * base_lr

    loader = DataLoader(
        train_ds, batch_size, seed=cfg.get("seed", 0),
        sharding=NamedSharding(mesh, P("data")), num_workers=cfg.get("num_workers", 2),
    )
    total_steps = cfg.get("max_steps", 100_000)
    tx = build_optimizer("AdamW", lr, total_steps=total_steps, accumulate_steps=accumulate)
    params = model.init_params(jax.random.key(cfg.get("seed", 0)), size)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"stage-2 UNet params: {n_params/1e6:.2f}M, lr={lr:.2e}")
    # LitEma warmup decay semantics (ldm/modules/ema.py:33-35)
    state = EMATrainState.create(params, tx, ema_decay=0.9999, ema_warmup=True)
    step_fn = make_ldm_train_step(model)

    with mesh:
        state = replicate(mesh, state)
        trainer = Trainer(
            TrainerConfig(
                logdir=f"{cfg.get('output_path', 'runs')}/{exp}",
                max_steps=total_steps,
                log_every=cfg.get("display_freq", 50),
                save_every=cfg.get("save_freq", 1000),
                eval_every=cfg.get("eval_every", 5000),
                seed=cfg.get("seed", 0),
            ),
            state, step_fn, loader,
            resume=bool(cfg.get("resume")),
        )
        trainer.fit()


if __name__ == "__main__":
    main()
