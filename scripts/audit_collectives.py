"""Audit the collectives XLA inserts for the spatially-sharded flagship UNet.

Compiles (does NOT run) the stage-1 denoise step and train step at FULL
production scale (64x128x128, base 64) on a virtual 8-device CPU mesh
with the production sharding (batch over `data`, z-spatial over `model`),
then parses the optimized HLO for collective ops — counts, operand
shapes, and total bytes moved per step.  This is the measurable half of
the multi-chip story on a one-chip box: the audited program is exactly
what the driver's dryrun executes, so halo-exchange traffic (and hence
an ICI-bandwidth scaling ceiling) is quantified even though ICI itself
cannot be timed here.  Results recorded in BENCH_NOTES 'Collective
audit' (round 3).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/audit_collectives.py [--light]
"""

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}
_COLLECTIVES = ("collective-permute", "all-gather", "all-reduce", "reduce-scatter",
                "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(m.group(1), 4)


def audit(hlo_text: str) -> dict:
    out = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        for op in _COLLECTIVES:
            m = re.search(rf"= ((?:\([^)]*\)|\S+)) {op}(?:-start)?\(", ls)
            if m:
                shape = m.group(1)
                shapes = re.findall(r"\w+\[[\d,]*\]", shape) or [shape]
                b = sum(_shape_bytes(s) for s in shapes)
                out.setdefault(op, {}).setdefault(shape, [0, b])[0] += 1
    return out


def report(title: str, compiled) -> float:
    res = audit(compiled.as_text())
    print(f"\n== {title} ==")
    total = 0
    if not res:
        print("  (no collectives)")
    for op, shapes in sorted(res.items()):
        for shape, (cnt, b) in sorted(shapes.items(), key=lambda kv: -kv[1][0] * kv[1][1]):
            total += cnt * b
            print(f"  {op:20s} x{cnt:<4d} {shape[:72]:72s} {cnt * b / 1e6:9.2f} MB")
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    flops = float(cost.get("flops", 0.0))
    print(f"  TOTAL {total/1e6:.2f} MB/step; program {flops/1e12:.3f} TFLOP "
          f"-> {total/max(flops,1):.5f} B/FLOP")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--light", action="store_true",
                    help="reduced spatial (16x32x32) for a fast smoke run")
    args = ap.parse_args()

    from jointimagegeneration_tpu.models import MaskSampler
    from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_mask_train_step

    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("data", "model"))
    spatial = (16, 32, 32) if args.light else (64, 128, 128)
    n_cls = 12

    model = MaskSampler.create(
        num_classes=n_cls, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
        spatial_axis="model", remat=True,
    )
    # param shapes are spatial-size-independent: init cheap, lower full-size
    params = model.init_params(jax.random.key(0), (16, 32, 32), cond_channels=1)
    key = jax.random.key(1)

    repl = NamedSharding(mesh, P())
    act = NamedSharding(mesh, P("data", "model"))

    with mesh:
        params_r = jax.device_put(params, repl)

        def denoise_step(params, key, xt, cond):
            t_b = jnp.full((1,), 500, jnp.int32)
            return model.denoise_step(params, key, xt, t_b, cond=cond)

        xt = jax.ShapeDtypeStruct((1, *spatial, n_cls), jnp.bfloat16, sharding=act)
        cond = jax.ShapeDtypeStruct((1, *spatial, 1), jnp.bfloat16, sharding=act)
        c1 = jax.jit(denoise_step).lower(params_r, key, xt, cond).compile()
        halo = report(f"stage-1 denoise step {spatial} data1xmodel8", c1)

        step = make_mask_train_step(model, class_weights=jnp.ones((n_cls,)))
        tx = build_optimizer("AdamW", 1e-4)
        state = EMATrainState.create(params, tx)
        state = jax.device_put(state, repl)
        dsh = NamedSharding(mesh, P("data"))
        batch = {
            "mask": jax.ShapeDtypeStruct((1, *spatial, n_cls), jnp.float32,
                                         sharding=NamedSharding(mesh, P("data", "model"))),
            "image": jax.ShapeDtypeStruct((1, *spatial, 1), jnp.float32,
                                          sharding=NamedSharding(mesh, P("data", "model"))),
        }
        del dsh
        c2 = jax.jit(step).lower(state, batch, key).compile()
        report(f"stage-1 train step {spatial} data1xmodel8", c2)

        # stage-2: one eps prediction at the flagship slice size, h sharded
        from jointimagegeneration_tpu.models import SliceLDM

        size = 128 if args.light else 512
        ldm = SliceLDM.create(
            image_channels=1, cond_channels=2, timesteps=1000, model_channels=128,
            channel_mult=(1, 2, 4, 4, 5), attention_resolutions=(32, 16, 8),
            num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
            spatial_axis="model",
        )
        lp = jax.device_put(ldm.init_params(jax.random.key(2), 64), repl)

        def eps_step(lp, x, cond):
            t_b = jnp.full((1,), 500, jnp.int32)
            return ldm.apply_model(lp, x, t_b, cond=cond)

        x2 = jax.ShapeDtypeStruct((1, size, size, 1), jnp.bfloat16, sharding=act)
        c2d = jax.ShapeDtypeStruct((1, size, size, 2), jnp.bfloat16, sharding=act)
        c3 = jax.jit(eps_step).lower(lp, x2, c2d).compile()
        report(f"stage-2 UNet eps step {size}x{size} data1xmodel8", c3)

    print(f"\nhalo traffic (denoise) {halo/1e6:.1f} MB/step; fully serialized over "
          f"one 45 GB/s ICI link that is {halo/45e9*1e3:.2f} ms/step")
    print("NOTE: CPU-compiled byte counts are f32; bf16 activation halos are "
          "HALF this on TPU (params/grads stay f32).")


if __name__ == "__main__":
    main()
