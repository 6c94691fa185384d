"""Misc utilities: host seeding, code self-archival, param counting.

(reference: ccdm/ddpm_eval.py:16-26 set_seeds; ccdm/ddpm/utils.py:41-44
archive_code; the missing ldm util count_params.)"""

from __future__ import annotations

import os
import random
import subprocess
import tarfile
from pathlib import Path

import numpy as np

__all__ = ["set_host_seeds", "archive_code", "count_params"]


def set_host_seeds(seed: int = 1024) -> None:
    """Seed all host-side RNGs (device RNG is explicit jax.random keys)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def archive_code(out_dir, repo_root=None) -> str:
    """tar.gz the tracked source into the run dir for reproducibility."""
    root = Path(repo_root or Path(__file__).resolve().parents[2])
    out = Path(out_dir) / "code.tar.gz"
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        files = subprocess.run(
            ["git", "ls-files"], cwd=root, capture_output=True, text=True, check=True
        ).stdout.splitlines()
    except Exception:
        files = [str(p.relative_to(root)) for p in root.rglob("*.py")]
    with tarfile.open(out, "w:gz") as tar:
        for f in files:
            p = root / f
            if p.exists():
                tar.add(p, arcname=f)
    return str(out)


def count_params(tree) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))
