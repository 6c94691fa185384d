"""Dataset index builder.

Replaces the reference's implicit data-prep entry points (the dataset
__main__ blocks that double as cache pre-builders, e.g.
ldm/data/ruijin_pimage_and_mask.py:177-181): scans a directory tree for
{image, totalseg, crcseg} NIfTI triples and writes the JSON index the
Ruijin* datasets consume; optionally precomputes frozen-BERT text
features to .npz (the form stage-1 actually trains on,
ccdm/datasets/ruijin.py:108-111).

    python -m jointimagegeneration_tpu.cli.build_index <root> <out_index.json> \
        [--image-glob "*ct.nii.gz"] [--seg-glob "*totalseg.nii.gz"] \
        [--tumor-glob "*crcseg.nii.gz"] [--texts texts.json] [--bert path]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out")
    ap.add_argument("--image-glob", default="*image.nii.gz")
    ap.add_argument("--seg-glob", default="*totalseg.nii.gz")
    ap.add_argument("--tumor-glob", default="*crcseg.nii.gz")
    ap.add_argument("--texts", help="JSON {case: report-text}")
    ap.add_argument("--bert", help="HF model path for precomputing text features")
    args = ap.parse_args(argv)

    root = Path(args.root).resolve()
    # datasets resolve relative paths against the index file's directory
    out_dir = Path(args.out).resolve().parent
    texts = json.loads(Path(args.texts).read_text()) if args.texts else {}
    index = {}
    for case_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        entry = {}
        for key, glob in [("image", args.image_glob), ("totalseg", args.seg_glob), ("crcseg", args.tumor_glob)]:
            hits = sorted(case_dir.glob(glob))
            if hits:
                p = hits[0].resolve()
                try:
                    entry[key] = str(p.relative_to(out_dir))
                except ValueError:
                    entry[key] = str(p)
        if "totalseg" not in entry:
            continue
        name = case_dir.name
        if name in texts:
            entry["text"] = texts[name]
        index[name] = entry

    if args.bert:
        from ..nn.text import FrozenBERTEmbedder
        import numpy as np

        bert = FrozenBERTEmbedder(args.bert)
        feat_dir = root / "text_features"
        feat_dir.mkdir(exist_ok=True)
        for name, entry in index.items():
            if "text" in entry:
                feats = bert(entry["text"])[0]
                out = feat_dir / f"{name}.npz"
                np.savez_compressed(out, features=feats)
                entry["text_features"] = str(out.resolve().relative_to(out_dir)) if out.resolve().is_relative_to(out_dir) else str(out.resolve())

    Path(args.out).write_text(json.dumps(index, indent=2))
    print(f"indexed {len(index)} cases -> {args.out}")


if __name__ == "__main__":
    main()
