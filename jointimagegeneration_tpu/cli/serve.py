"""Inference server: text/mask → CT generation over HTTP.

Production-serving surface (the reference has none — generation is
offline scripts only; this completes the deployment story).  stdlib
http.server: models compile once at startup (scan-compiled samplers),
requests run the jitted programs, responses stream NIfTI bytes or JSON
summaries.  Single-threaded by design — one TPU program runs at a time;
batching is the mesh's job, not the server's.

    python -m jointimagegeneration_tpu.cli.serve <config.yml> [port]

POST /generate {"kind": "mask"|"two_stage", "seed": int, "batch": int?,
                "mask_steps": int?, "stream": bool?, "guidance_scale": float?,
                "warm_start": float?, "sampler": "ddim"|"plms"|"dpm"?}
  -> {"labels_nifti_b64"| "ct_nifti_b64", "class_counts", "elapsed_s"}
  `batch: N` generates N volumes in one jitted call, one volume per
  data-axis mesh slot when multiple devices exist.  `stream: true` on
  two_stage returns NDJSON: a header line with the mask volume, then one
  line per CT slice as the autoregressive z-loop emits it, then a
  summary line — slice-by-slice delivery instead of a whole-volume wait.
GET /healthz -> {"status": "ok", "device": ...}

A `first_stage:` (+ optional `cond_stage:`) section under `stage2`
serves the latent (`_ae`) route: generation runs through LatentSliceLDM
(cond-stage encode / first-stage decode per slice), matching
cli/sample.py and the latent train_ldm path.
"""

from __future__ import annotations

import base64
import io
import json
import sys
import tempfile
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import load_yaml_config
from ..core.runtime import enable_persistent_compile_cache
from ..diffusion.ddim import DDIMParams
from ..pipeline import TwoStagePipeline
from .common import build_mask_sampler, build_slice_ldm, feature_cond
from .sample import _load_params


def _nifti_b64(vol: np.ndarray) -> str:
    from ..data.nifti import write_nifti

    with tempfile.NamedTemporaryFile(suffix=".nii.gz") as f:
        write_nifti(f.name, vol)
        f.seek(0)
        return base64.b64encode(Path(f.name).read_bytes()).decode()


def _batched_mesh(state: dict, bs: int):
    """Mesh + replicated param trees for a batched request, cached per
    batch size in `state` — params never change between requests, so the
    full-weight host->device broadcast happens once, not per request."""
    cache = state.setdefault("_mesh_cache", {})
    ent = cache.get(bs)
    if ent is None:
        from ..parallel.mesh import make_mesh_for_batch, replicate

        mesh = make_mesh_for_batch(bs)
        ent = cache[bs] = (
            mesh,
            replicate(mesh, (state["ms_params"], state.get("ldm_params"),
                             state.get("ae_params"), state.get("cond_ae_params"))),
        )
    return ent


def make_handler(state: dict):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def _stream_two_stage(self, state, msp, lp, key, bs, cond, mask_steps, t0,
                              guidance_scale=1.0, ae_params=None, cond_ae_params=None,
                              warm_start=None, sampler="ddim"):
            """NDJSON streaming: the mask volume first, then one line per
            generated CT slice AS the autoregressive z-loop produces it
            (stream_volume host generator), then a summary line.  HTTP/1.0
            stream-until-close; each line is self-contained JSON."""
            from ..pipeline.two_stage import normalize_mask_channel, upsample_labels

            k1, k2 = jax.random.split(key)
            fc = feature_cond(state.get("feat_fn"), state.get("feat_idx"), cond)
            labels = state["ms"].sample_labels(
                msp, k1, (bs, *state["spatial"]), cond=cond, feature_cond=fc,
                num_steps=mask_steps)
            labels_up = upsample_labels(labels, state["volume_shape"])
            mask_channel = normalize_mask_channel(labels_up, state["ms"].num_classes)
            # headers go out only once the (fallible) mask stage is done —
            # from here every failure is reported as an NDJSON error line,
            # never a second HTTP status into the open 200 body
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.end_headers()

            def line(obj):
                self.wfile.write((json.dumps(obj) + "\n").encode())
                self.wfile.flush()

            try:
                d = int(mask_channel.shape[1])
                line({"kind": "two_stage_stream", "n_slices": d, "batch": bs,
                      "labels_nifti_b64": _nifti_b64(np.asarray(labels_up[0]).astype(np.uint8))})
                from ..models.latent_ldm import LatentSliceLDM

                if isinstance(state["ldm"], LatentSliceLDM):
                    gen = state["ldm"].stream_volume(
                        lp, ae_params, k2, mask_channel, state["ddim"],
                        cond_ae_params=cond_ae_params, guidance_scale=guidance_scale,
                        warm_start=warm_start, sampler=sampler)
                else:
                    gen = state["ldm"].stream_volume(
                        lp, k2, mask_channel, state["ddim"],
                        guidance_scale=guidance_scale, warm_start=warm_start,
                        sampler=sampler)
                for z, s in enumerate(gen):
                    arr = np.asarray(s).astype(np.float16)  # (B, H, W, C)
                    line({"slice": z, "shape": list(arr.shape), "dtype": "float16",
                          "data_b64": base64.b64encode(arr.tobytes()).decode()})
                line({"done": True, "elapsed_s": round(time.perf_counter() - t0, 2)})
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-stream
            except Exception as e:
                try:
                    line({"error": str(e)})
                except OSError:
                    pass

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "device": str(jax.devices()[0])})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                kind = req.get("kind", "mask")
                key = jax.random.key(int(req.get("seed", 0)))
                t0 = time.perf_counter()
                if kind == "mask":
                    ms, msp, spatial = state["ms"], state["ms_params"], state["spatial"]
                    # "batch": N samples N volumes in one jitted call, batch
                    # axis over the data mesh when multiple devices exist
                    bs = max(1, int(req.get("batch", 1)))
                    cond = jnp.zeros((bs, *spatial, 1))
                    if bs > 1 and len(jax.devices()) > 1:
                        from ..parallel.mesh import shard_batch

                        mesh, (msp, *_) = _batched_mesh(state, bs)
                        cond = shard_batch(mesh, cond)
                    fc = feature_cond(state.get("feat_fn"), state.get("feat_idx"), cond)
                    batch_labels = np.asarray(
                        ms.sample_labels(
                            msp, key, (bs, *spatial), cond=cond, feature_cond=fc,
                            num_steps=int(req.get("mask_steps", state["mask_steps"])),
                        )
                    )
                    labels = batch_labels[0]
                    counts = {int(c): int(n) for c, n in zip(*np.unique(labels, return_counts=True))}
                    resp = {
                        "labels_nifti_b64": _nifti_b64(labels.astype(np.uint8)),
                        "class_counts": counts,
                        "elapsed_s": round(time.perf_counter() - t0, 2),
                    }
                    if bs > 1:
                        resp["batch_labels_nifti_b64"] = [
                            _nifti_b64(v.astype(np.uint8)) for v in batch_labels
                        ]
                    self._json(200, resp)
                elif kind == "two_stage":
                    pipe, msp, lp = state["pipe"], state["ms_params"], state["ldm_params"]
                    aep, caep = state.get("ae_params"), state.get("cond_ae_params")
                    # batching across volumes: one volume per data-axis slot
                    # when multiple devices exist (batch axis 0 is sharded,
                    # params replicated — grad-free twin of the train mesh)
                    bs = max(1, int(req.get("batch", 1)))
                    cond = jnp.zeros((bs, *state["spatial"], 1))
                    if bs > 1 and len(jax.devices()) > 1:
                        from ..parallel.mesh import shard_batch

                        mesh, (msp, lp, aep, caep) = _batched_mesh(state, bs)
                        cond = shard_batch(mesh, cond)
                    steps = int(req.get("mask_steps", state["mask_steps"]))
                    gs = float(req.get("guidance_scale", 1.0))
                    # "warm_start": f ∈ (0,1] runs only the last f-fraction
                    # of DDIM steps per slice after the first, seeded from
                    # the previous slice (SliceLDM.sample_volume docstring)
                    ws = req.get("warm_start")
                    ws = float(ws) if ws is not None else None
                    # "sampler": ddim (default) | plms | dpm — dpm is the
                    # low-step-count DPM-Solver++(2M) route
                    smp = str(req.get("sampler", "ddim"))
                    if req.get("stream"):
                        self._stream_two_stage(state, msp, lp, key, bs, cond, steps, t0,
                                               guidance_scale=gs, ae_params=aep,
                                               cond_ae_params=caep, warm_start=ws,
                                               sampler=smp)
                        return
                    fc = feature_cond(state.get("feat_fn"), state.get("feat_idx"), cond)
                    ct, labels = pipe(
                        msp, lp, key,
                        mask_shape=(bs, *state["spatial"]), volume_shape=state["volume_shape"],
                        ddim=state["ddim"], mask_steps=steps, cond=cond, feature_cond=fc,
                        guidance_scale=gs, ae_params=aep, cond_ae_params=caep,
                        warm_start=ws, sampler=smp,
                    )
                    ct, labels = np.asarray(ct), np.asarray(labels)
                    resp = {
                        "ct_nifti_b64": _nifti_b64(ct[0, ..., 0].astype(np.float32)),
                        "labels_nifti_b64": _nifti_b64(labels[0].astype(np.uint8)),
                        "elapsed_s": round(time.perf_counter() - t0, 2),
                    }
                    if bs > 1:
                        resp["batch_ct_nifti_b64"] = [
                            _nifti_b64(v[..., 0].astype(np.float32)) for v in ct]
                        resp["batch_labels_nifti_b64"] = [
                            _nifti_b64(v.astype(np.uint8)) for v in labels]
                    self._json(200, resp)
                else:
                    self._json(400, {"error": f"unknown kind {kind!r}"})
            except Exception as e:  # surface errors to the client
                self._json(500, {"error": str(e)})

    return Handler


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = load_yaml_config(argv[0])
    enable_persistent_compile_cache()
    port = int(argv[1]) if len(argv) > 1 else 8787

    s1 = cfg.get("stage1", cfg)
    # top-level step_T_sample reaches the sampler build, as in cli/sample.py
    if "step_T_sample" in cfg and "step_T_sample" not in s1:
        s1 = {**s1, "step_T_sample": cfg["step_T_sample"]}
    ms = build_mask_sampler(s1)
    spatial = tuple(s1.get("dataset", {}).get("volume_shape", (64, 128, 128)))
    # dense DINO conditioning from config (same seed rule as training /
    # sampling: extractor key = stage-1 seed + 11, cli/train_mask.py)
    from .common import build_dino_feature_fn

    feat_fn, feat_idx, feat_shape = build_dino_feature_fn(s1, spatial)
    ms_params = _load_params(
        lambda: ms.init_params(
            jax.random.key(0), spatial, cond_channels=1,
            feature_cond_shapes=None if feat_idx is None else {feat_idx: feat_shape},
        ),
        s1.get("checkpoint"),
    )
    state = {"ms": ms, "ms_params": ms_params, "spatial": spatial,
             "mask_steps": cfg.get("mask_steps", 250),
             "feat_fn": feat_fn, "feat_idx": feat_idx}
    if "stage2" in cfg:
        s2 = cfg["stage2"]
        inner = build_slice_ldm(s2)
        size = s2.get("slice_size", 256)
        # latent (`_ae`) serving: a first_stage section routes generation
        # through LatentSliceLDM, shared assembly with sample/train_ldm
        # (scale factor resolves from the trainer's latent_scale.json)
        from .common import build_latent_ldm

        latent, ae_params, cond_ae_params, size = build_latent_ldm(s2, inner, size)
        ldm = latent if latent is not None else inner
        if latent is not None:
            state["ae_params"] = ae_params
            state["cond_ae_params"] = cond_ae_params
        lp = _load_params(
            lambda: inner.init_params(jax.random.key(1), size),
            s2.get("checkpoint"),
        )
        state.update(
            pipe=TwoStagePipeline(ms, ldm), ldm=ldm, ldm_params=lp,
            ddim=DDIMParams.create(ldm.diffusion, cfg.get("ddim_steps", 50),
                                   method=cfg.get("ddim_discretize",
                                                  s2.get("ddim_discretize", "uniform")),
                                   eta=cfg.get("ddim_eta", 0.0)),
            volume_shape=tuple(cfg.get("volume_shape", (128, 256, 256))),
        )
    server = HTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"serving on :{port} (device {jax.devices()[0]})")
    server.serve_forever()


if __name__ == "__main__":
    main()
