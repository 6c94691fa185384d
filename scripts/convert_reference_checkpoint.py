"""Convert a trained reference checkpoint into a sampleable checkpoint dir.

Takes a torch checkpoint holding a guided-diffusion UNet — a ccdm ignite
checkpoint (`{'model': …, 'average_model': <bare UNet sd>}`,
ccdm/ddpm/trainer.py:444-452), an LDM Lightning checkpoint
(`state_dict` with `model.diffusion_model.*` keys), or a bare UNet
state_dict — and writes an orbax checkpoint directory that `cli/sample.py`
/ `cli/serve.py` consume via their `checkpoint:` config key (the
converted tree is stored as both `params` and `ema_params`).

    python scripts/convert_reference_checkpoint.py model.pt out_ckpt/ \
        --model-channels 128 --channel-mult 1,2,4,4,5 --num-res-blocks 2 \
        --attention-resolutions 16,8,4 --num-head-channels 32

`--attention-resolutions` uses the in-model `ds` convention (what
UNetModel consumes), matching this framework's UNet config.  Add
`--new-attention-order` only for checkpoints trained with
use_new_attention_order=True (the reference configs use the legacy
default).

`--ae [PREFIX]` converts an AutoencoderKL instead (a standalone AE
training checkpoint, or one embedded in an LDM checkpoint under e.g.
`first_stage_model.` / `cond_stage_model.` — auto-detected when PREFIX
is omitted); the output dir is what the sample/serve/train_ldm configs'
`first_stage.checkpoint` / `cond_stage.checkpoint` keys consume
(loaded by cli.common.load_ae_params).  The `_ae` porting recipe is
three runs: `--ae first_stage_model.`, `--ae cond_stage_model.`, and a
plain UNet conversion of the same checkpoint.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--entry", default=None,
                   help="sub-dict to use (default: auto — 'state_dict', then "
                        "'average_model', then the checkpoint root)")
    p.add_argument("--ae", nargs="?", const="", default=None, metavar="PREFIX",
                   help="convert an AutoencoderKL instead of a UNet; optional "
                        "state_dict prefix like 'first_stage_model.' "
                        "(auto-detected when omitted)")
    p.add_argument("--model-channels", type=int, default=None)
    p.add_argument("--channel-mult", default="1,2,4,8")
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--attention-resolutions", default="",
                   help="comma-separated ds values, e.g. 16,8,4")
    p.add_argument("--num-head-channels", type=int, default=-1)
    p.add_argument("--num-heads", type=int, default=1)
    p.add_argument("--new-attention-order", action="store_true")
    p.add_argument("--lenient", action="store_true",
                   help="ignore unconsumed checkpoint keys instead of failing")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager
    from jointimagegeneration_tpu.utils.torch_convert import convert_guided_diffusion_unet

    raw = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = raw
    if args.entry is not None:
        sd = raw[args.entry]
    elif isinstance(raw, dict):
        for entry in ("state_dict", "average_model"):
            if entry in raw and isinstance(raw[entry], dict):
                sd = raw[entry]
                print(f"using checkpoint entry {entry!r}")
                break
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}

    if args.ae is not None:
        from jointimagegeneration_tpu.utils.torch_convert import convert_ldm_autoencoder

        tree = convert_ldm_autoencoder(sd, prefix=args.ae or None,
                                       strict=not args.lenient)
        n = sum(int(np.prod(v.shape)) for v in __import__("jax").tree.leaves(tree))
        mgr = CheckpointManager(args.out_dir)
        # bare-variables layout ({'params': …}, no GANTrainState wrapper) —
        # load_ae_params detects it by the missing 'g_params' key
        mgr.save(0, {"params": tree})
        mgr.wait()
        print(f"converted AE ({n/1e6:.2f}M params) -> {args.out_dir}; point the "
              "config's first_stage/cond_stage `checkpoint:` key at it")
        return

    if args.model_channels is None:
        p.error("--model-channels is required for UNet conversion")
    attn = tuple(int(a) for a in args.attention_resolutions.split(",") if a)
    params = convert_guided_diffusion_unet(
        sd,
        model_channels=args.model_channels,
        channel_mult=tuple(int(m) for m in args.channel_mult.split(",")),
        num_res_blocks=args.num_res_blocks,
        attention_resolutions=attn,
        num_head_channels=args.num_head_channels,
        num_heads=args.num_heads,
        use_new_attention_order=args.new_attention_order,
        strict=not args.lenient,
    )
    n = sum(int(np.prod(v.shape)) for v in __import__("jax").tree.leaves(params))
    tree = {"params": params}
    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, {"params": tree, "ema_params": tree, "step": 0})
    mgr.wait()
    print(f"converted {n/1e6:.2f}M params -> {args.out_dir} (step 0); "
          f"point the sample/serve config's `checkpoint:` key at it")


if __name__ == "__main__":
    main()
