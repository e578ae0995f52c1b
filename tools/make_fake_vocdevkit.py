"""Fabricate a VOCdevkit-shaped directory from synthetic data.

Builds the exact layout `tools/voc_to_yolo.py` (and therefore
`tools/run_voc_parity.sh`) consumes — VOC2007/VOC2012 with JPEGImages,
Pascal-XML Annotations (incl. a sprinkling of ``difficult`` objects so the
converter's filter is exercised), and ImageSets/Main split files matching
the reference recipe (train = 2007 train + 2012 trainval, val = 2007 val).
Class names are the 20 real VOC names; boxes come from the synthetic
rectangle generator, so a short end-to-end dress rehearsal of the
published-number protocol (README.md:39-60) can run without the dataset.

    python tools/make_fake_vocdevkit.py --out /tmp/fake_devkit \
        [--n-2007-train 8 --n-2007-val 6 --n-2012 8] [--size 416]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.voc_to_yolo import VOC_CLASSES  # noqa: E402

XML = """<annotation>
  <filename>{fid}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
{objects}</annotation>
"""
OBJ = """  <object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
"""


def fabricate(out: str, n_2007_train: int, n_2007_val: int, n_2012: int,
              size: int, seed: int = 0) -> None:
    import numpy as np

    from podtpu.data.synthetic import generate

    tmp = os.path.join(out, "_synth_src")
    total = n_2007_train + n_2007_val + n_2012
    info = generate(tmp, n_train=total, n_val=0, size=size,
                    num_classes=20, seed=seed)
    with open(info["train_list"]) as f:
        srcs = [line.strip() for line in f if line.strip()]
    rng = np.random.default_rng(seed + 1)

    plan = ([("2007", "train", i) for i in range(n_2007_train)]
            + [("2007", "val", i) for i in range(n_2007_val)]
            + [("2012", "trainval", i) for i in range(n_2012)])
    splits: dict[tuple[str, str], list[str]] = {}
    for idx, (year, split, i) in enumerate(plan):
        root = os.path.join(out, f"VOC{year}")
        os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
        os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
        fid = f"{idx:06d}"
        src = srcs[idx]
        shutil.copyfile(src, os.path.join(root, "JPEGImages", f"{fid}.jpg"))
        objects = []
        with open(os.path.splitext(src)[0] + ".txt") as f:
            for line in f:
                cid, cx, cy, w, h = line.split()
                cid = int(cid)
                cx, cy, w, h = (float(v) * size for v in (cx, cy, w, h))
                objects.append(OBJ.format(
                    name=VOC_CLASSES[cid],
                    # ~10% difficult: the converter must drop these
                    difficult=int(rng.random() < 0.1),
                    x1=max(1, int(cx - w / 2)), y1=max(1, int(cy - h / 2)),
                    x2=min(size, int(cx + w / 2)),
                    y2=min(size, int(cy + h / 2))))
        with open(os.path.join(root, "Annotations", f"{fid}.xml"), "w") as f:
            f.write(XML.format(fid=fid, w=size, h=size,
                               objects="".join(objects)))
        splits.setdefault((year, split), []).append(fid)

    for (year, split), ids in splits.items():
        d = os.path.join(out, f"VOC{year}", "ImageSets", "Main")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{split}.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    shutil.rmtree(tmp)
    print(f"fabricated VOCdevkit at {out}: "
          f"{ {f'{y}/{s}': len(v) for (y, s), v in splits.items()} }")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-2007-train", type=int, default=8)
    ap.add_argument("--n-2007-val", type=int, default=6)
    ap.add_argument("--n-2012", type=int, default=8)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    fabricate(args.out, args.n_2007_train, args.n_2007_val, args.n_2012,
              args.size, args.seed)


if __name__ == "__main__":
    main()
