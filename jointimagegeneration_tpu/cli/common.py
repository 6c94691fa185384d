"""Shared CLI assembly: config -> model/data/optimizer/state builders."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import (
    NNUNetLayoutDataset,
    RuijinMaskDataset,
    RuijinSlicePairDataset,
    RuijinVolumeDataset,
    SyntheticMaskDataset,
    SyntheticSliceDataset,
)
from ..data.loader import DataLoader
from ..models import MaskSampler, SliceLDM
from ..models.autoencoder import AutoencoderKL
from ..train import EMATrainState, build_optimizer

__all__ = [
    "build_mask_sampler", "build_slice_ldm", "build_mask_dataset",
    "build_slice_dataset", "build_autoencoder", "build_dino_feature_fn",
    "feature_cond", "load_ae_params", "build_latent_ldm", "LATENT_SCALE_FILE",
    "maybe_init_from",
]

LATENT_SCALE_FILE = "latent_scale.json"


def maybe_init_from(cfg: dict, params, resume_key: str = "load_from"):
    """Apply `init_from:` warm-start surgery to freshly-initialised params
    (the reference's `ckpt_path` + `ignore_keys` [+ only_model] config
    route into init_from_ckpt, ddpm.py:187-203 / main.py:739-741).

    Accepts `init_from: <path>` or
    `init_from: {path, ignore_keys: [prefix…], only_model: bool,
    source: params|ema_params}`.  Ignored (with a note) when the run is
    RESUMING from its own checkpoints — resume restores the full state
    later and must win, matching Lightning's resume_from_checkpoint
    precedence."""
    spec = cfg.get("init_from")
    if not spec:
        return params
    if cfg.get(resume_key) or cfg.get("resume"):
        print("init_from: ignored — run is resuming from its own checkpoints")
        return params
    if isinstance(spec, str):
        spec = {"path": spec}
    from ..core.checkpoint import load_partial

    return load_partial(
        params, spec["path"],
        ignore_keys=tuple(spec.get("ignore_keys", ())),
        only_model=bool(spec.get("only_model", False)),
        source=spec.get("source", "params"),
    )


def build_latent_ldm(s2: dict, inner, size: int):
    """Assemble the latent (`_ae`) route — ONE definition shared by
    sample/serve/train_ldm so the wiring cannot drift between surfaces:
    build + load the frozen AEs, resolve the latent scale factor, wrap the
    pixel-space SliceLDM.  Returns (latent, ae_params, cond_ae_params,
    latent_size); (None, None, None, size) when `s2` has no first_stage.

    scale_factor resolution order: explicit `first_stage.scale_factor`;
    else the `latent_scale.json` sidecar next to the UNet checkpoint
    (written by train_ldm when `scale_by_std` calibrates — the reference
    persists scale_factor inside its checkpoint, ddpm.py:484-499); else
    1.0 with a warning if the model was likely std-calibrated."""
    fs_cfg = s2.get("first_stage")
    if not fs_cfg:
        return None, None, None, size
    from ..models.latent_ldm import LatentSliceLDM

    ae = build_autoencoder(fs_cfg)
    cond_ae = build_autoencoder(s2["cond_stage"]) if s2.get("cond_stage") else None
    # the volume routes always encode the [prev slice (out_ch), mask (1)]
    # pixel pair — with no cond_stage the first-stage encoder would be fed
    # out_ch+1 channels and die inside jit; fail at assembly instead
    enc = cond_ae or ae
    need = ae.out_ch + 1
    if enc.in_channels != need:
        which = "cond_stage" if cond_ae else "first_stage (used as cond encoder — add a cond_stage section)"
        raise ValueError(
            f"latent cond encoder ({which}) has in_channels={enc.in_channels} but the "
            f"[prev slice, mask] condition is {need}-channel")
    ae_params = load_ae_params(ae, fs_cfg, size, 3)
    cond_ae_params = (
        load_ae_params(cond_ae, s2.get("cond_stage"), size, 5) if cond_ae else ae_params
    )
    sf = fs_cfg.get("scale_factor")
    if sf is None:
        sf = 1.0
        ck = s2.get("checkpoint")
        if ck:
            import json
            from pathlib import Path

            sidecar = Path(ck) / LATENT_SCALE_FILE
            if sidecar.exists():
                sf = float(json.loads(sidecar.read_text())["scale_factor"])
                print(f"latent scale_factor {sf:.4f} from {sidecar}")
    latent = LatentSliceLDM(
        inner=inner, first_stage=ae, cond_stage=cond_ae, scale_factor=float(sf)
    )
    return latent, ae_params, cond_ae_params, size // ae.downsample_factor


def load_ae_params(module: AutoencoderKL, section: Optional[dict], size: int,
                   key_seed: int = 3):
    """Frozen-AE params for the latent (`_ae`) path, shared by every
    surface (sample, serve, train_ldm).

    Accepts either checkpoint layout at `section['checkpoint']`:
      * a `cli.train_ae` run (GANTrainState: the generator lives under
        'g_params' next to discriminator/optimizer state), or
      * a converted reference AutoencoderKL
        (scripts/convert_reference_checkpoint.py --ae: bare {'params': …}).
    Restores by NAME onto a fresh template (no discriminator/optimizer
    template needed — the sampling path must not depend on the training
    run's optimizer topology), then shape-checks every leaf.  Falls back
    to fresh-init with a loud warning, mirroring _load_params."""
    import flax.serialization

    from ..core.checkpoint import CheckpointManager

    def fresh():
        from ..models.autoencoder import VQModel

        x = jnp.zeros((1, size, size, module.in_channels))
        if isinstance(module, VQModel):
            return module.init(jax.random.key(key_seed), x)
        return module.init(jax.random.key(key_seed), x, jax.random.key(key_seed + 1))

    ck = (section or {}).get("checkpoint")
    if ck:
        mgr = CheckpointManager(ck)
        if mgr.latest_step() is not None:
            raw = mgr.restore_raw()
            gp = raw.get("g_params", raw if "params" in raw else None)
            if gp is None:
                # the path RESOLVED to a checkpoint; wrong contents must not
                # masquerade as a missing path and train against random AEs
                raise ValueError(
                    f"checkpoint at {ck!r} has neither 'g_params' (cli.train_ae) "
                    f"nor 'params' (converted AE) — keys: {sorted(raw)[:6]}; "
                    "is this an AE checkpoint?")
            template = fresh()
            restored = flax.serialization.from_state_dict(template, gp)
            jax.tree.map(
                lambda t, r: (_ for _ in ()).throw(ValueError(
                    f"AE checkpoint leaf shape {r.shape} != model {t.shape} "
                    f"(wrong ddconfig for {ck}?)")) if t.shape != r.shape else None,
                template, restored)
            # resident on device once — jitted per-slice calls (serve
            # streaming) must not re-upload the full AE trees per slice
            return jax.device_put(restored)
    print(f"WARNING: no AE checkpoint at {ck!r} — using FRESH-INIT (random) "
          "first-stage weights" if ck else
          "WARNING: no AE checkpoint configured — using FRESH-INIT (random) "
          "first-stage weights")
    return fresh()


def build_dino_feature_fn(cfg: dict, spatial, key: Optional[jax.Array] = None):
    """Config route for dense DINO feature conditioning (the reference
    builds the extractor from config inside run_train and applies it per
    step: condition_encoder.py:22-109, trainer.py:287, 850-852).

    Given a stage-1 config with `feature_cond_encoder: {type: dino,
    inject_idx: N, ...}`, returns (feat_fn, inject_idx, site_shape) where
    `feat_fn` is a jittable (B, H, W, C) images -> (B, th, tw, D) map at
    the injection-site grid and `site_shape` = (th, tw, D) for
    init_params(feature_cond_shapes=...).  (None, None, None) when the
    config has no dino encoder.

    With `key=None` the extractor key derives canonically as
    `seed + 11` from the SAME config — every surface (train_mask, sample,
    serve) must share this rule: an uncalibrated extractor initialised
    from a different key silently produces different random features than
    the UNet was trained against."""
    fce = cfg.get("feature_cond_encoder", {}) or {}
    if fce.get("type") != "dino":
        return None, None, None
    if key is None:
        key = jax.random.key(cfg.get("seed", 0) + 11)
    if cfg.get("dims", 3) != 2:
        raise ValueError(
            "dino dense feature conditioning is 2D (the reference extractor is a 2D "
            "ViT, ccdm/ddpm/models/dino.py); set dims: 2 / use a 2D dataset variant"
        )
    from ..models.cond_encoders import (
        build_feature_cond_encoder,
        inject_site_downsample,
        make_dense_feature_fn,
    )

    enc, enc_params, _ = build_feature_cond_encoder(fce, key)
    u = cfg.get("unet_openai", {})
    idx = fce.get("inject_idx", 1)
    dsf = inject_site_downsample(
        tuple(u.get("channel_mult", (1, 2, 2, 4, 5))), u.get("num_res_blocks", 2), idx
    )
    site = (spatial[0] // dsf, spatial[1] // dsf)
    fn = make_dense_feature_fn(
        enc, enc_params, site, layer=fce.get("layer", 11), facet=fce.get("facet", "key")
    )
    return fn, idx, (*site, enc.vit.dim)


def feature_cond(feat_fn, feat_idx, cond):
    """The per-batch dense-feature dict every surface feeds the UNet
    (None when no extractor is configured) — single definition so the
    {inject_idx: features} contract cannot drift between surfaces."""
    return None if feat_fn is None else {feat_idx: feat_fn(cond)}


def build_autoencoder(m: dict) -> AutoencoderKL:
    """First-stage AE from a model-config section (embed_dim + ddconfig keys
    mirroring the reference yaml, ruijin-ldm_from_controlnet_ae.yaml:41-66).
    `type: vq` builds the VQGAN variant instead (same key as cli.train_ae);
    as an LDM first stage it gets VQModelInterface semantics — diffusion in
    the pre-quant latent, decode through the codebook (autoencoder.py:283-301)."""
    dd = m.get("ddconfig", {})
    if m.get("type", "kl") == "vq":
        from ..models.autoencoder import VQModel

        return VQModel(
            embed_dim=m.get("embed_dim", 4),
            n_embed=m.get("n_embed", 8192),
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            z_channels=dd.get("z_channels", 4),
            in_channels=dd.get("in_channels", 1),
            out_ch=dd.get("out_ch", 1),
            dims=dd.get("dims", 2),
            dropout=dd.get("dropout", 0.0),
            resolution=dd.get("resolution", 512),
            attn_type="linear" if dd.get("use_linear_attn") else dd.get("attn_type", "vanilla"),
        )
    return AutoencoderKL(
        embed_dim=m.get("embed_dim", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        z_channels=dd.get("z_channels", 4),
        in_channels=dd.get("in_channels", 1),
        out_ch=dd.get("out_ch", 1),
        dims=dd.get("dims", 2),
        dropout=dd.get("dropout", 0.0),
        resolution=dd.get("resolution", 512),
        attn_type="linear" if dd.get("use_linear_attn") else dd.get("attn_type", "vanilla"),
    )


def build_mask_sampler(cfg: dict) -> MaskSampler:
    """cfg keys mirror ccdm params.yml (unet_openai + diffusion sections)."""
    u = cfg.get("unet_openai", {})
    fce = cfg.get("feature_cond_encoder", {}) or {}
    selfattn = fce.get("type") == "selfattn"
    return MaskSampler.create(
        num_classes=cfg.get("num_classes", 12),
        time_steps=cfg.get("time_steps", 1000),
        schedule=cfg.get("beta_schedule", "cosine"),
        model_channels=u.get("base_channels", 64),
        channel_mult=tuple(u.get("channel_mult", (1, 2, 2, 4, 5))),
        attention_resolutions=tuple(u.get("attention_resolutions", (32, 16, 8))),
        num_res_blocks=u.get("num_res_blocks", 2),
        num_head_channels=u.get("num_head_channels", 32),
        context_dim=fce.get("embed_dim") if selfattn else None,
        dims=cfg.get("dims", 3),
        # the trainable text refiner joins the train state (params['refiner'])
        # unless the config freezes it (condition_encoder.py trainable path)
        text_refiner=fce if selfattn and fce.get("train", True) else None,
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
        step_T_sample=cfg.get("step_T_sample", "majority"),
        remat=cfg.get("remat", False),
        remat_policy=cfg.get("remat_policy"),
    )


def build_slice_ldm(cfg: dict) -> SliceLDM:
    """cfg keys mirror the LDM yaml model.params section."""
    u = cfg.get("unet_config", {}).get("params", cfg.get("unet", {}))
    return SliceLDM.create(
        image_channels=cfg.get("channels", 1),
        cond_channels=cfg.get("cond_channels", 2),
        timesteps=cfg.get("timesteps", 1000),
        beta_schedule=cfg.get("beta_schedule", "linear"),
        linear_start=cfg.get("linear_start", 0.0015),
        linear_end=cfg.get("linear_end", 0.0195),
        model_channels=u.get("model_channels", 128),
        channel_mult=tuple(u.get("channel_mult", (1, 2, 4, 4, 5))),
        attention_resolutions=tuple(u.get("attention_resolutions", (32, 16, 8))),
        num_res_blocks=u.get("num_res_blocks", 2),
        num_head_channels=u.get("num_head_channels", 32),
        context_dim=u.get("context_dim"),
        # 'adm' class-conditioning from the UNet config's num_classes key
        # (openaimodel.py:516-517 + ddpm.py:1428)
        adm_classes=u.get("num_classes", cfg.get("adm_classes")),
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
        remat=cfg.get("remat", False),
    )


def build_mask_dataset(cfg: dict, split: str):
    d = cfg.get("dataset", {})
    kind = d.get("kind", "synthetic")
    shape = tuple(d.get("volume_shape", (64, 128, 128)))
    if kind == "synthetic":
        fce = cfg.get("feature_cond_encoder", {}) or {}
        ctx_shape = None
        if fce.get("type") == "selfattn":
            ctx_shape = (d.get("context_len", 4), fce.get("embed_dim", 768))
        return SyntheticMaskDataset(
            num_cases=d.get("num_cases", 16),
            volume_shape=shape,
            num_classes=cfg.get("num_classes", 12),
            context_shape=ctx_shape,
            seed=d.get("seed", 0),
        )
    if kind == "ruijin":
        return RuijinMaskDataset(
            d["index"], split=split, volume_shape=shape,
            num_classes=cfg.get("num_classes", 12),
            max_size=d.get("max_size"),
        )
    if kind == "ruijin_3d":
        # CT volume + mask volume + text (ldm/data/ruijin_3d.py equivalent)
        return RuijinVolumeDataset(
            d["index"], split=split, volume_shape=shape,
            num_classes=cfg.get("num_classes", 12),
        )
    raise ValueError(f"unknown dataset kind {kind!r}")


def build_slice_dataset(cfg: dict, split: str):
    d = cfg.get("dataset", {})
    kind = d.get("kind", "synthetic")
    shape = tuple(d.get("slice_shape", (512, 512)))
    if kind == "synthetic":
        return SyntheticSliceDataset(
            num_cases=d.get("num_cases", 16), slice_shape=shape,
            depth=d.get("depth", 8), include_volumes=split != "train",
        )
    if kind == "ruijin":
        return RuijinSlicePairDataset(d["index"], split=split, slice_shape=shape)
    if kind == "nnunet":
        # nnUNet folder layout (ldm/data/cmu.py equivalent)
        return NNUNetLayoutDataset(
            d["root"], split=split, slice_shape=shape,
            num_classes=cfg.get("num_classes", 12),
        )
    if kind == "lsun":
        # stock LSUN filelist datasets (ldm/data/lsun.py); pair with an
        # unconditional model (cond_channels: 0, channels: 3)
        from ..data.stock import LSUNBase, lsun_dataset

        if "txt_file" in d:
            return LSUNBase(d["txt_file"], d["data_root"], size=d.get("size", shape[0]),
                            flip_p=d.get("flip_p", 0.5 if split == "train" else 0.0))
        return lsun_dataset(d["category"], "train" if split == "train" else "val",
                            size=d.get("size", shape[0]))
    if kind == "imagenet":
        from ..data.stock import ImageNetLocal

        return ImageNetLocal(d["root"], filelist=d.get("filelist"),
                             size=d.get("size", shape[0]), synsets=d.get("synsets"),
                             random_crop=split == "train")
    if kind == "imagenet_sr":
        # ImageNetSR semantics (imagenet.py:272-374): HR target + LR cond
        # (bicubic-upsampled) for concat-conditioned SR training
        from ..data.stock import ImageNetLocal, SRDataset, SRToLDMAdapter

        base = ImageNetLocal(d["root"], filelist=d.get("filelist"),
                             process_images=False, synsets=d.get("synsets"))
        sr = SRDataset(base, size=d.get("size", shape[0]),
                       degradation=d.get("degradation", "bsrgan_light"),
                       downscale_f=d.get("downscale_f", 4),
                       min_crop_f=d.get("min_crop_f", 0.5),
                       max_crop_f=d.get("max_crop_f", 1.0),
                       random_crop=split == "train")
        return SRToLDMAdapter(sr)
    raise ValueError(f"unknown dataset kind {kind!r}")
