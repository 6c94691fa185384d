"""Translate a reference config (ccdm params[_eval].yml or a latentdiffusion
OmegaConf yaml) into this framework's config format.

    python scripts/import_reference_config.py /path/to/params.yml -o stage1.yml

See jointimagegeneration_tpu/core/ref_import.py for the key map; unmapped
keys are printed as NOTEs.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jointimagegeneration_tpu.core.ref_import import _main

if __name__ == "__main__":
    _main()
