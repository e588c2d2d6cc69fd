"""Per-dataset converter walkers on synthetic miniature archives
(reference prediction/tools/convert_datasets/ parity — layouts, splits,
label encodings, output naming)."""

import gzip
import os
import os.path as osp
import tarfile
import zipfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from peanut_tpu.cli.convert import main as convert_main


def _png_bytes(arr):
    ok, buf = cv2.imencode(".png", arr)
    assert ok
    return buf.tobytes()


def _write_zip(path, entries):
    with zipfile.ZipFile(path, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)


def _img(rng, h=8, w=8, c=3):
    return (rng.rand(h, w, c) * 255).astype(np.uint8)


def _ann(val=255, h=8, w=8):
    a = np.zeros((h, w, 3), np.uint8)
    a[2:5, 2:5] = val
    return a


def test_chase_db1(tmp_path, rng):
    entries = {}
    for i in range(28):
        ok, jpg = cv2.imencode(".jpg", _img(rng))
        entries[f"Image_{i:02d}.jpg"] = jpg.tobytes()
        entries[f"Image_{i:02d}_1stHO.png"] = _png_bytes(_ann(255))
        entries[f"Image_{i:02d}_2ndHO.png"] = _png_bytes(_ann(200))
    zp = tmp_path / "CHASEDB1.zip"
    _write_zip(zp, entries)
    out = tmp_path / "out"
    convert_main(["dataset", "chase_db1", str(zp), "-o", str(out)])
    train_imgs = os.listdir(out / "images" / "training")
    val_imgs = os.listdir(out / "images" / "validation")
    train_anns = os.listdir(out / "annotations" / "training")
    val_anns = os.listdir(out / "annotations" / "validation")
    # 84 sorted files: first 60 -> training (20 jpg + 40 ann)
    assert len(train_imgs) + len(train_anns) == 60
    assert len(val_imgs) + len(val_anns) == 24
    ann = cv2.imread(str(out / "annotations" / "training" /
                         train_anns[0]), cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(ann)) <= {0, 1}


def test_drive(tmp_path, rng):
    from PIL import Image

    def gif_bytes(arr):
        import io

        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="GIF")
        return b.getvalue()

    train = {"training/images/21_training.png": _png_bytes(_img(rng)),
             "training/1st_manual/21_manual1.gif":
                 gif_bytes(_ann(255)[:, :, 0])}
    test = {"test/images/01_test.png": _png_bytes(_img(rng)),
            "test/1st_manual/01_manual1.gif":
                gif_bytes(_ann(129)[:, :, 0])}
    tz, vz = tmp_path / "training.zip", tmp_path / "test.zip"
    _write_zip(tz, train)
    _write_zip(vz, test)
    out = tmp_path / "out"
    convert_main(["dataset", "drive", str(tz), str(vz), "-o", str(out)])
    assert os.listdir(out / "images" / "training") == ["21.png"]
    assert os.listdir(out / "images" / "validation") == ["01.png"]
    ann = cv2.imread(str(out / "annotations" / "validation" /
                         "01_manual1.png"), cv2.IMREAD_GRAYSCALE)
    assert ann.max() == 1   # 129 // 128


def test_stare(tmp_path, rng):
    def tar_of_gz(path, stem_fmt, make):
        with tarfile.open(path, "w") as t:
            for i in range(20):
                ppm = cv2.imencode(".ppm", make(i))[1].tobytes()
                gz_path = tmp_path / f"{stem_fmt.format(i)}.ppm.gz"
                with gzip.open(gz_path, "wb") as g:
                    g.write(ppm)
                t.add(gz_path, arcname=gz_path.name)

    imgs_tar = tmp_path / "stare-images.tar"
    ah_tar = tmp_path / "labels-ah.tar"
    vk_tar = tmp_path / "labels-vk.tar"
    tar_of_gz(imgs_tar, "im{:04d}", lambda i: _img(rng))
    tar_of_gz(ah_tar, "im{:04d}.ah", lambda i: _ann(255))
    tar_of_gz(vk_tar, "im{:04d}.vk", lambda i: _ann(130))
    out = tmp_path / "out"
    convert_main(["dataset", "stare", str(imgs_tar), str(ah_tar),
                  str(vk_tar), "-o", str(out)])
    assert len(os.listdir(out / "images" / "training")) == 10
    assert len(os.listdir(out / "images" / "validation")) == 10
    assert len(os.listdir(out / "annotations" / "training")) == 20


def test_hrf(tmp_path, rng):
    zips = []
    for kind in ("healthy", "glaucoma", "dr"):
        z = tmp_path / f"{kind}.zip"
        _write_zip(z, {f"{kind}_{i:02d}.png": _png_bytes(_img(rng))
                       for i in range(15)})
        m = tmp_path / f"{kind}_manualsegm.zip"
        _write_zip(m, {f"{kind}_{i:02d}.png": _png_bytes(_ann(255))
                       for i in range(15)})
        zips += [str(z), str(m)]
    out = tmp_path / "out"
    convert_main(["dataset", "hrf", zips[0], zips[1], zips[2], zips[3],
                  zips[4], zips[5], "-o", str(out)])
    assert len(os.listdir(out / "images" / "training")) == 15   # 5 x 3
    assert len(os.listdir(out / "images" / "validation")) == 30
    assert len(os.listdir(out / "annotations" / "training")) == 15


def test_potsdam_and_vaihingen(tmp_path, rng):
    # one train + one val tile each, 32x32, clipped at 16/8
    color = np.zeros((32, 32, 3), np.uint8)
    color[:16] = [255, 255, 255]      # impervious surface -> label 1
    color[16:] = [0, 0, 255]          # BGR blue-channel red -> label 2
    cases = {
        "potsdam": (["top_potsdam_2_10_RGB.tif",
                     "top_potsdam_5_15_RGB.tif"],
                    lambda t: t.replace("_RGB", "_label")),
        # real ISPRS GT archive layout: FLAT tifs named *_noBoundary.tif
        # (vaihingen.py routes on 'noBoundary'; there is no label/ subdir)
        "vaihingen": (["top_mosaic_09cm_area1.tif",
                       "top_mosaic_09cm_area6.tif"],
                      lambda t: t.replace(".tif", "_noBoundary.tif")),
    }
    for name, (tiles, label_name) in cases.items():
        ddir = tmp_path / f"{name}_data"
        ddir.mkdir()
        imgs = {t: _png_bytes((rng.rand(32, 32, 3) * 255).astype(np.uint8))
                for t in tiles}
        _write_zip(ddir / "images.zip", imgs)
        labels = {label_name(t): _png_bytes(color) for t in tiles}
        if name == "vaihingen":
            # upstream deletes the unused area9 ground truth
            labels[label_name("top_mosaic_09cm_area9.tif")] = \
                _png_bytes(color)
        _write_zip(ddir / "labels.zip", labels)
        out = tmp_path / f"{name}_out"
        convert_main(["dataset", name, str(ddir), "-o", str(out),
                      "--clip_size", "16", "--stride_size", "8"])
        train_imgs = os.listdir(out / "img_dir" / "train")
        val_imgs = os.listdir(out / "img_dir" / "val")
        train_anns = os.listdir(out / "ann_dir" / "train")
        assert train_imgs and val_imgs and train_anns
        # upstream quirk reproduced: windows are spaced by CLIP size (the
        # stride only affects the count bound), so a 32x32 tile at clip 16
        # yields the 2x2 aligned grid (overflow windows clamp onto it)
        assert len(train_imgs) == 4
        stem = "2_10" if name == "potsdam" else "area1"
        assert f"{stem}_0_0_16_16.png" in train_imgs
        lab = cv2.imread(str(out / "ann_dir" / "train" / train_anns[0]),
                         cv2.IMREAD_GRAYSCALE)
        assert set(np.unique(lab)) <= set(range(7))
        if name == "vaihingen":
            val_anns = os.listdir(out / "ann_dir" / "val")
            everything = train_imgs + val_imgs + train_anns + val_anns
            assert not any(f.startswith("area9_") for f in everything)


def test_loveda(tmp_path, rng):
    for dataset in ("Train", "Val", "Test"):
        entries = {}
        for loc in ("Rural", "Urban"):
            entries[f"{dataset}/{loc}/images_png/{loc}_1.png"] = \
                _png_bytes(_img(rng))
            if dataset != "Test":
                entries[f"{dataset}/{loc}/masks_png/{loc}_1.png"] = \
                    _png_bytes(_ann(3)[:, :, 0])
        _write_zip(tmp_path / f"{dataset}.zip", entries)
    out = tmp_path / "out"
    convert_main(["dataset", "loveda", str(tmp_path), "-o", str(out)])
    assert len(os.listdir(out / "img_dir" / "train")) == 2
    assert len(os.listdir(out / "ann_dir" / "val")) == 2
    assert len(os.listdir(out / "img_dir" / "test")) == 2


def test_coco_stuff164k(tmp_path, rng):
    from PIL import Image

    ann_dir = tmp_path / "annotations" / "train2017"
    ann_dir.mkdir(parents=True)
    (tmp_path / "annotations" / "val2017").mkdir()
    mask = np.zeros((8, 8), np.uint8)
    mask[0] = 12     # valid id -> trainId 11 (id 11 is invalid)
    mask[1] = 11     # invalid  -> 255
    mask[2] = 181    # last     -> 170
    Image.fromarray(mask).save(ann_dir / "000001.png")
    convert_main(["dataset", "coco_stuff164k", str(tmp_path)])
    out = np.array(Image.open(ann_dir / "000001_labelTrainIds.png"))
    assert out[0, 0] == 11 and out[1, 0] == 255 and out[2, 0] == 170
    assert out[3, 0] == 0


def test_isaid(tmp_path, rng):
    from PIL import Image
    import io

    def png(arr):
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="PNG")
        return b.getvalue()

    img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
    mask = np.zeros((20, 20, 3), np.uint8)
    mask[5:10, 5:10] = [0, 0, 63]    # class 1
    for mode in ("train", "val", "test"):
        (tmp_path / mode / "images").mkdir(parents=True)
        _write_zip(tmp_path / mode / "images" / "part1.zip",
                   {"images/P0000.png": png(img)})
        if mode != "test":
            (tmp_path / mode / "Semantic_masks").mkdir(parents=True)
            _write_zip(
                tmp_path / mode / "Semantic_masks" / "masks.zip",
                {"images/P0000_instance_color_RGB.png": png(mask)})
    out = tmp_path / "out"
    convert_main(["dataset", "isaid", str(tmp_path), "-o", str(out),
                  "--patch_width", "16", "--patch_height", "16",
                  "--overlap_area", "8"])
    train_imgs = sorted(os.listdir(out / "img_dir" / "train"))
    train_anns = sorted(os.listdir(out / "ann_dir" / "train"))
    assert len(train_imgs) == len(train_anns) == 4   # 20->16/8 grid: 2x2
    assert train_anns[0].startswith("P0000_") and \
        train_anns[0].endswith("_instance_color_RGB.png")
    lab = np.array(Image.open(out / "ann_dir" / "train" / train_anns[0]))
    assert set(np.unique(lab)) <= {0, 1}
    assert len(os.listdir(out / "img_dir" / "test")) == 1
