"""Dataset / model weight converters.

Reference twins of prediction/tools/convert_datasets/ (13 scripts) and
prediction/tools/model_converters/ (7 scripts):

  python -m peanut_tpu.cli.convert model  vit|mit|swin|vitjax SRC OUT_DIR
  python -m peanut_tpu.cli.convert dataset cityscapes DATA_ROOT
  python -m peanut_tpu.cli.convert dataset voc_aug DEVKIT SBD OUT
  python -m peanut_tpu.cli.convert dataset remap IN_DIR OUT_DIR --table t.json
  python -m peanut_tpu.cli.convert dataset chase_db1|drive|hrf|stare|
      pascal_context|isaid|potsdam|vaihingen|loveda|coco_stuff10k|
      coco_stuff164k ...   (per-dataset walkers, see cli/convert_datasets.py)

Model converters read torch ``.pth``/``.npz`` checkpoints and write a
native orbax checkpoint (restore with core.checkpoint.load_checkpoint or
pass as ``pretrained=`` to a zoo backbone).  Dataset converters rewrite
annotation pngs into the trainId label spaces the datasets expect.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

# Cityscapes labelId -> trainId (the 19-class mapping from the reference's
# cityscapes.py converter / cityscapesscripts labels table)
CITYSCAPES_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def _remap_png(src: str, dst: str, lut: np.ndarray):
    import cv2

    img = cv2.imread(src, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"unreadable: {src}")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    cv2.imwrite(dst, lut[img])


def _build_lut(table: dict, default: int = 255) -> np.ndarray:
    lut = np.full(256, default, np.uint8)
    for k, v in table.items():
        lut[int(k)] = int(v)
    return lut


def dataset_cityscapes(args):
    """gtFine labelIds -> labelTrainIds (convert_datasets/cityscapes.py)."""
    lut = _build_lut(CITYSCAPES_ID_TO_TRAIN)
    pat = os.path.join(args.data_root, "gtFine", "**", "*_labelIds.png")
    files = sorted(glob.glob(pat, recursive=True))
    for i, f in enumerate(files):
        _remap_png(f, f.replace("_labelIds", "_labelTrainIds"), lut)
        if i % 200 == 0:
            print(f"{i}/{len(files)}")
    print(f"converted {len(files)} annotation maps")


def dataset_voc_aug(args):
    """SBD .mat annotations -> pngs merged with VOC2012
    (convert_datasets/voc_aug.py)."""
    from scipy.io import loadmat  # gated: scipy only needed here
    import cv2

    mats = sorted(glob.glob(os.path.join(args.sbd, "dataset", "cls",
                                         "*.mat")))
    out = os.path.join(args.out, "SegmentationClassAug")
    os.makedirs(out, exist_ok=True)
    for i, m in enumerate(mats):
        seg = loadmat(m)["GTcls"][0]["Segmentation"][0].astype(np.uint8)
        name = os.path.splitext(os.path.basename(m))[0]
        cv2.imwrite(os.path.join(out, name + ".png"), seg)
        if i % 500 == 0:
            print(f"{i}/{len(mats)}")
    print(f"converted {len(mats)} SBD annotations -> {out}")


def dataset_binarize(args):
    """Retina-vessel datasets (CHASE_DB1 / DRIVE / HRF / STARE converters):
    threshold annotation images to {0 background, 1 vessel} pngs."""
    import cv2

    files = sorted(
        f for ext in ("png", "jpg", "tif", "gif", "ppm", "bmp")
        for f in glob.glob(os.path.join(args.in_dir, "**", f"*.{ext}"),
                           recursive=True))
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for f in files:
        img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        if img is None:
            try:  # gif annotations (DRIVE) need PIL
                from PIL import Image

                img = np.array(Image.open(f).convert("L"))
            except Exception:
                print(f"skipped unreadable {f}")
                continue
        name = os.path.splitext(os.path.basename(f))[0]
        out = (img >= args.threshold).astype(np.uint8)
        cv2.imwrite(os.path.join(args.out_dir, name + ".png"), out)
        n += 1
    print(f"binarized {n} annotation maps -> {args.out_dir}")


def dataset_remap(args):
    """Generic label remap over a directory tree (covers the coco_stuff /
    potsdam / vaihingen / loveda style converters: each is a fixed id
    table applied to every annotation png)."""
    with open(args.table) as f:
        lut = _build_lut(json.load(f), default=args.default)
    files = sorted(glob.glob(os.path.join(args.in_dir, "**", "*.png"),
                             recursive=True))
    for i, f in enumerate(files):
        rel = os.path.relpath(f, args.in_dir)
        _remap_png(f, os.path.join(args.out_dir, rel), lut)
        if i % 200 == 0:
            print(f"{i}/{len(files)}")
    print(f"remapped {len(files)} maps")


MODEL_CONVERTERS = {}


def model_convert(args):
    from ..models import zoo_import
    from ..core.checkpoint import load_torch_state_dict, save_checkpoint

    kind = args.kind
    if kind == "vitjax":
        src = dict(np.load(args.src))
        variables, leftovers = zoo_import.convert_augreg_vit(src)
    else:
        sd = load_torch_state_dict(args.src)
        if kind in ("stdc1", "stdc2"):
            variables, leftovers = zoo_import.convert_official_stdc(
                sd, "STDCNet1" if kind == "stdc1" else "STDCNet2")
        else:
            fn = {"vit": zoo_import.convert_timm_vit,
                  "mit": zoo_import.convert_official_mit,
                  "swin": zoo_import.convert_official_swin,
                  "convnext": zoo_import.convert_mmcls_convnext,
                  "beit": zoo_import.convert_official_beit,
                  "twins": zoo_import.convert_official_twins}[kind]
            variables, leftovers = fn(sd)
    n_params = len(jax_tree_leaves(variables))
    save_checkpoint(args.out, variables)
    print(f"converted {kind}: {n_params} arrays -> {args.out}")
    if leftovers:
        print(f"unmapped source keys ({len(leftovers)}):")
        for k in leftovers[:20]:
            print("  ", k)


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("model")
    m.add_argument("kind", choices=["vit", "mit", "swin", "vitjax",
                                    "convnext", "beit", "stdc1", "stdc2",
                                    "twins"])
    m.add_argument("src")
    m.add_argument("out")
    m.set_defaults(fn=model_convert)

    d = sub.add_parser("dataset")
    dsub = d.add_subparsers(dest="dataset", required=True)

    cs = dsub.add_parser("cityscapes")
    cs.add_argument("data_root")
    cs.set_defaults(fn=dataset_cityscapes)

    va = dsub.add_parser("voc_aug")
    va.add_argument("devkit")
    va.add_argument("sbd")
    va.add_argument("out")
    va.set_defaults(fn=dataset_voc_aug)

    bz = dsub.add_parser("binarize")
    bz.add_argument("in_dir")
    bz.add_argument("out_dir")
    bz.add_argument("--threshold", type=int, default=128)
    bz.set_defaults(fn=dataset_binarize)

    rm = dsub.add_parser("remap")
    rm.add_argument("in_dir")
    rm.add_argument("out_dir")
    rm.add_argument("--table", required=True,
                    help="JSON {src_id: dst_id} table")
    rm.add_argument("--default", type=int, default=255)
    rm.set_defaults(fn=dataset_remap)

    # per-dataset layout walkers (convert_datasets/ twins)
    from .convert_datasets import register_subcommands
    register_subcommands(dsub)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
