"""Metrics/observability: scalar + image logging, throughput counters,
profiler hooks.

Equivalent surface to the reference's tensorboardX writer + ignite
Frequency/GpuInfo (ccdm trainer.py:466-680) and the Lightning loggers +
CUDACallback epoch-time/peak-VRAM (main.py:337-494).  TPU translation:
`imgs/s` from host timing around stepped batches, HBM watermark from
`jax.local_devices()[0].memory_stats()`, and `jax.profiler` trace capture
instead of nvidia-smi polling."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["MetricLogger", "Throughput", "hbm_stats", "profile_trace", "summarize_trace"]


class MetricLogger:
    """Writes scalars to tensorboardX when available, always to JSONL;
    optional W&B mirror (the reference's gated wandb option,
    ccdm/ddpm/trainer.py:502-520, off by default)."""

    def __init__(self, logdir, wandb_project: Optional[str] = None, wandb_mode: str = "offline"):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        # seed the PNG FIFO from files already on disk so the 30-file bound
        # holds per RUN DIRECTORY across resumes (the reference ImageLogger's
        # bound is per logdir, main.py:381-385), oldest first
        try:
            self._png_queue = sorted((self.logdir / "images").glob("*.png"),
                                     key=lambda p: p.stat().st_mtime)
        except Exception:
            self._png_queue = []
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            self._tb = None
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, mode=wandb_mode, dir=str(self.logdir))
            except Exception:
                self._wandb = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step)}
        for k, v in values.items():
            name = f"{prefix}{k}"
            v = float(v)
            rec[name] = v
            if self._tb:
                self._tb.add_scalar(name, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"}, step=step)

    # on-disk grid FIFO bound — the reference ImageLogger keeps at most 30
    # PNGs per run and unlinks the oldest (latentdiffusion/main.py:356,381-385)
    max_images = 30

    def image(self, step: int, name: str, img: np.ndarray) -> None:
        """img: (H, W, 3) uint8 — tensorboard panel + bounded PNG trail
        under `<logdir>/images/` (ImageLogger.log_local parity)."""
        if self._tb:
            self._tb.add_image(name, img, step, dataformats="HWC")
        try:
            from PIL import Image

            img_dir = self.logdir / "images"
            img_dir.mkdir(exist_ok=True)
            fname = f"{name.replace('/', '_')}_gs-{int(step):06d}.png"
            Image.fromarray(np.asarray(img)).save(str(img_dir / fname))
            path = img_dir / fname
            # re-logging the same (name, step) overwrites one file — keep a
            # single queue entry (a duplicate would later unlink a file a
            # newer entry still counts as retained)
            if path in self._png_queue:
                self._png_queue.remove(path)
            self._png_queue.append(path)
            while len(self._png_queue) > self.max_images:
                old = self._png_queue.pop(0)
                old.unlink(missing_ok=True)
        except Exception:
            pass  # PNG trail is best-effort; tb/JSONL remain authoritative

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


class Throughput:
    """imgs/s counter (ignite Frequency equivalent, trainer.py:476-478)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._n = 0

    def update(self, n: int):
        self._n += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0


def hbm_stats() -> Dict[str, float]:
    """Device memory watermarks (CUDACallback peak-VRAM equivalent,
    main.py:482-494)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "hbm_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
            "hbm_peak_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
            "hbm_limit_mb": stats.get("bytes_limit", 0) / 2**20,
        }
    except Exception:
        return {}


class profile_trace:
    """`with profile_trace(logdir):` — jax.profiler capture around a region."""

    def __init__(self, logdir):
        self.logdir = str(logdir)

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def summarize_trace(logdir, top_k: int = 20, group: str = "name"):
    """Per-op device-time breakdown from a `profile_trace` capture.

    Parses the newest `*.trace.json.gz` under `<logdir>/plugins/profile/`,
    keeps complete ('X') events on DEVICE process lanes (process_name
    starting with '/device:'), and aggregates wall time by `group`:
      - "name":     raw HLO instruction name (fusion.NNN, …)
      - "category": XLA's `hlo_category` arg (convolution fusion, loop fusion, …)
      - "tf_op":    the jit module path XLA stamps on each op
                    (…/UNet/up_0_0_res/conv_general_dilated) — maps device
                    time back to model code
    Returns [(key, total_ms, count, gflop, gbytes)] sorted by total time,
    longest first; gflop/gbytes come from XLA's per-op cost analysis
    (`model_flops` / `bytes_accessed`), so achieved TF/s = gflop/total_ms and
    GB/s = gbytes/total_ms per row — a roofline view per op. This is the
    per-op view the reference got from nvidia-smi/profiler summaries
    (SURVEY §5 tracing), here from XLA's own device timeline."""
    import glob
    import gzip

    files = sorted(glob.glob(str(Path(logdir) / "plugins" / "profile" / "*" / "*.trace.json.gz")))
    if not files:
        return []
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and str(e.get("args", {}).get("name", "")).startswith("/device:")
    }
    agg: Dict[str, list] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e:
            args = e.get("args", {})
            cat = args.get("hlo_category", "?")
            # control-flow/module envelopes wrap the whole capture; keeping
            # them (in any grouping) double-counts every total/share.
            # Uncategorised events are kept (copy-done etc.) unless they are
            # the jit module envelope itself.
            if cat in ("while", "conditional", "call"):
                continue
            if cat == "?" and (group != "name" or str(e.get("name", "")).startswith("jit")):
                continue
            if group == "category":
                key = args.get("hlo_category", "?")
            elif group == "tf_op":
                # strip the jit(...)/while/body wrapper prefix and trailing ':'
                key = args.get("tf_op", e.get("name", "?")).rstrip(":")
                for marker in ("closed_call/", "body/"):
                    if marker in key:
                        key = key.rsplit(marker, 1)[-1]
            else:
                key = e.get("name", "?")
            s = agg.setdefault(key, [0.0, 0, 0.0, 0.0])
            s[0] += float(e["dur"]) / 1e3  # µs -> ms
            s[1] += 1
            s[2] += float(args.get("model_flops", 0)) / 1e9
            s[3] += float(args.get("bytes_accessed", 0)) / 1e9
    rows = sorted(
        ((n, t, c, gf, gb) for n, (t, c, gf, gb) in agg.items()), key=lambda r: -r[1]
    )
    return rows[:top_k]
