"""Preemption drill: SIGUSR1 checkpoints mid-run, SIGINT checkpoints and
exits, and a rerun resumes — the reference's signal surface
(latentdiffusion/main.py:784-801 melk/SIGUSR1, main.py:297-301
KeyboardInterrupt) exercised end-to-end through the stage-1 CLI."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest
import yaml

pytestmark = pytest.mark.slow

_REPO = Path(__file__).resolve().parents[1]


def _cfg(tmp_path):
    return {
        "output_path": str(tmp_path / "runs"),
        "seed": 0,
        "num_classes": 4,
        "time_steps": 10,
        "beta_schedule": "cosine",
        "bf16": False,
        "remat": False,
        "batch_size": 2,
        "max_steps": 100000,   # effectively run-forever; signals end it
        "save_freq": 100000,   # never on cadence — only signals checkpoint
        "display_freq": 2,
        "class_weights": "uniform",
        "eval_time_steps": 2,
        "n_validation_images": 0,
        "optim": {"name": "AdamW", "learning_rate": 1e-3,
                  "lr_function": "static", "lr_params": {}},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [2], "num_res_blocks": 1,
                        "num_head_channels": 4},
        "feature_cond_encoder": {"type": "none"},
        "dataset": {"kind": "synthetic", "volume_shape": [4, 8, 8], "num_cases": 4},
    }


def _env():
    import re

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_PLATFORMS"] = "cpu"
    # conftest's 8 virtual devices leak through XLA_FLAGS; the CLI would then
    # build an 8-way data mesh that batch_size=2 cannot shard over
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    return env


def _wait_for(pred, timeout, what):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return
        time.sleep(1.0)
    raise AssertionError(f"timed out waiting for {what}")


def test_sigusr1_checkpoint_sigint_exit_resume(tmp_path):
    cfg_path = tmp_path / "drill.yml"
    cfg_path.write_text(yaml.safe_dump(_cfg(tmp_path)))
    rundir = tmp_path / "runs" / "drill"
    ckdir = rundir / "checkpoints"

    # stdout must go to a file: with a PIPE nobody drains, the child blocks
    # on print once the 64 KB buffer fills and training silently stalls
    log = open(tmp_path / "train.log", "wb")
    proc = subprocess.Popen(
        [sys.executable, "-m", "jointimagegeneration_tpu.cli.train_mask", str(cfg_path), "drill"],
        env=_env(), cwd=_REPO, stdout=log, stderr=subprocess.STDOUT,
    )
    try:
        _wait_for(lambda: (rundir / "metrics.jsonl").exists()
                  and (rundir / "metrics.jsonl").stat().st_size > 0,
                  480, "training to start logging")
        assert not (ckdir.exists() and any(ckdir.iterdir())), "no cadence checkpoint expected"

        proc.send_signal(signal.SIGUSR1)
        _wait_for(lambda: ckdir.exists() and any(p.name.isdigit() for p in ckdir.iterdir()),
                  120, "SIGUSR1 checkpoint")
        steps_after_usr1 = sorted(int(p.name) for p in ckdir.iterdir() if p.name.isdigit())

        proc.send_signal(signal.SIGINT)
        proc.wait(timeout=120)
        steps_after_int = sorted(int(p.name) for p in ckdir.iterdir() if p.name.isdigit())
        assert steps_after_int[-1] >= steps_after_usr1[-1], "SIGINT did not checkpoint"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    # resume from the interrupt checkpoint
    resume_step = steps_after_int[-1]
    out = subprocess.run(
        [sys.executable, "-m", "jointimagegeneration_tpu.cli.train_mask", str(cfg_path), "drill",
         "load_from=true", f"max_steps={resume_step + 4}"],
        env=_env(), cwd=_REPO, capture_output=True, text=True, timeout=360,
    )
    assert f"resumed from step {resume_step}" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
