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


def convert_legacy_resblock_params(tree):
    """Rewrite a round-1 param tree (ResBlocks as nested submodules:
    in_norm/GroupNorm_0/{scale,bias}, in_conv/{kernel,bias}, emb_proj,
    out_norm/GroupNorm_0, out_conv, skip) into the current flat layout
    (norm1_scale, conv1_kernel, emb_kernel, norm2_*, conv2_*, skip_*).
    Non-ResBlock subtrees pass through untouched; apply to a restored raw
    checkpoint before `flax.serialization`-style loading."""
    legacy = {"in_norm", "in_conv", "emb_proj", "out_norm", "out_conv"}

    def walk(node):
        if not isinstance(node, dict):
            return node
        if legacy.issubset(node.keys()):
            out = {k: walk(v) for k, v in node.items()
                   if k not in legacy and k != "skip"}
            out["norm1_scale"] = node["in_norm"]["GroupNorm_0"]["scale"]
            out["norm1_bias"] = node["in_norm"]["GroupNorm_0"]["bias"]
            out["conv1_kernel"] = node["in_conv"]["kernel"]
            out["conv1_bias"] = node["in_conv"]["bias"]
            out["emb_kernel"] = node["emb_proj"]["kernel"]
            out["emb_bias"] = node["emb_proj"]["bias"]
            out["norm2_scale"] = node["out_norm"]["GroupNorm_0"]["scale"]
            out["norm2_bias"] = node["out_norm"]["GroupNorm_0"]["bias"]
            out["conv2_kernel"] = node["out_conv"]["kernel"]
            out["conv2_bias"] = node["out_conv"]["bias"]
            if "skip" in node:
                out["skip_kernel"] = node["skip"]["kernel"]
                out["skip_bias"] = node["skip"]["bias"]
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(tree)
