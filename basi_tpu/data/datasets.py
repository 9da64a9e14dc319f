"""Datasets: ILSO / SOC instance-mask layouts, folder datasets, synthetic.

The reference loads an image plus per-instance GT masks per sample (SURVEY
§2.3/2.4 — ILSO: 1k images, SOC: instance-annotated subset). Host-side we
only *index and decode*; all augmentation is on-device. Samples are
letterboxed (aspect-preserving resize + top-left zero pad) to the square
model size on the host in uint8.

Supported on-disk conventions (auto-detected):
  * labeled PNG: ``masks/<stem>.png`` where pixel value k>0 = instance k
  * per-instance PNGs: ``masks/<stem>/<k>.png`` binary masks
  * synthetic: procedurally generated blob scenes (no files needed) — used
    by the smoke-train and AP-harness tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np


@dataclass
class Sample:
    image: np.ndarray  # (H, W, 3) uint8, letterboxed to model size
    masks: np.ndarray  # (M, H, W) uint8 0/1, letterboxed, padded to M slots
    valid: np.ndarray  # (M,) uint8
    orig_hw: np.ndarray  # (2,) int32 original image size
    valid_hw: np.ndarray  # (2,) int32 content size inside the letterbox
    name: str = ""


def decode_label_letterbox(path: str, size: int) -> np.ndarray:
    """Decode a LABELED mask PNG to raw per-pixel instance ids, nearest-
    letterboxed to (size, size).

    Labeled masks ('pixel value k>0 = instance k') must NEVER go through an
    RGB conversion: a palettized (VOC-style) PNG's ids live in the palette
    INDICES, and converting to RGB maps distinct ids to colors that can
    collide in any single channel (e.g. (0,128,0) and (0,0,128) both have
    R=0), silently merging or erasing instances. PIL 'P'/'L'/'I' modes
    return the raw indices directly. Nearest sampling uses the center
    convention floor((j+0.5)*scale) — identical to PIL NEAREST and the
    native decoder's nearest path.
    """
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("P", "L", "I", "I;16"):
            arr = np.asarray(im)
            if arr.ndim == 3:  # RGB-coded labels: keep prior R-channel rule
                arr = arr[..., 0]
        else:
            arr = np.asarray(im)
    h, w = arr.shape[:2]
    vh, vw = letterbox_params(h, w, size)
    ys = np.minimum(((np.arange(vh) + 0.5) * (h / vh)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(vw) + 0.5) * (w / vw)).astype(np.int64), w - 1)
    out = np.zeros((size, size), arr.dtype)
    out[:vh, :vw] = arr[ys[:, None], xs[None, :]]
    return out


def letterbox_params(orig_h: int, orig_w: int, size: int) -> tuple[int, int]:
    """Content size after aspect-preserving resize into a size x size box.

    Rounds half AWAY from zero (int(x + 0.5)) to match the C++ decoder's
    letterbox exactly — Python's round() is banker's rounding and disagrees
    at .5 boundaries (e.g. 382.5), which would shift valid_hw one pixel off
    the decoded content and mis-invert the letterbox in paste_mask."""
    scale = size / max(orig_h, orig_w)
    return (max(1, int(orig_h * scale + 0.5)),
            max(1, int(orig_w * scale + 0.5)))


class SyntheticDataset:
    """Procedural blob scenes with per-instance masks.

    Deterministic per (seed, index); no files, no decode — exercises the
    full train/eval path (SURVEY §4 item 3).

    ``orig_max_scale > 1``: scenes are generated at a per-index
    NON-SQUARE original resolution up to that multiple of ``image_size``
    and letterboxed down — exercising the original-resolution AP protocol
    (paste + native-GT matching) without files. ``get_orig_masks`` serves
    the native-resolution GT either way.
    """

    def __init__(self, n: int = 256, image_size: int = 512,
                 max_instances: int = 8, seed: int = 0,
                 orig_max_scale: float = 1.0):
        self.n = n
        self.size = image_size
        self.max_instances = max_instances
        self.seed = seed
        self.orig_max_scale = orig_max_scale

    def __len__(self) -> int:
        return self.n

    def _dims(self, i: int) -> tuple[int, int]:
        if self.orig_max_scale <= 1.0:
            return self.size, self.size
        # Separate RNG stream: scene draws stay identical for a given
        # (seed, index) regardless of the original-resolution setting.
        rng = np.random.RandomState((self.seed * 7919 + i * 31 + 7) % (2 ** 31))
        r1, r2 = rng.rand(2)
        oh = int(self.size * (1.0 + r1 * (self.orig_max_scale - 1.0)))
        ow = int(self.size * (1.0 + r2 * (self.orig_max_scale - 1.0)))
        if oh == ow:
            ow += 1  # force non-square (that's the point of the mode)
        return oh, ow

    def _scene(self, i: int, oh: int, ow: int):
        """(image (oh, ow, 3) u8, masks (M, oh, ow) u8, valid (M,) u8)."""
        rng = np.random.RandomState((self.seed * 1_000_003 + i) % (2 ** 31))
        img = (rng.rand(oh, ow, 3) * 60 + 40).astype(np.uint8)  # noisy bg
        k = rng.randint(1, self.max_instances + 1)
        masks = np.zeros((self.max_instances, oh, ow), np.uint8)
        yy, xx = np.mgrid[0:oh, 0:ow]
        for m in range(k):
            cy = rng.randint(oh // 8, 7 * oh // 8)
            cx = rng.randint(ow // 8, 7 * ow // 8)
            ry = rng.randint(oh // 16, oh // 5)
            rx = rng.randint(ow // 16, ow // 5)
            ang = rng.rand() * np.pi
            ca, sa = np.cos(ang), np.sin(ang)
            u = (xx - cx) * ca + (yy - cy) * sa
            v = -(xx - cx) * sa + (yy - cy) * ca
            ell = (u / rx) ** 2 + (v / ry) ** 2 <= 1.0
            # Later instances occlude earlier ones (realistic instance GT).
            for prev in range(m):
                masks[prev][ell] = 0
            masks[m] = ell.astype(np.uint8)
            color = rng.randint(100, 255, size=3)
            img[ell] = (0.7 * color + 0.3 * img[ell]).astype(np.uint8)
        valid = np.array(
            [1 if masks[m].sum() > 16 else 0
             for m in range(self.max_instances)], np.uint8)
        return img, masks, valid

    def image_id(self, i: int):
        """COCO-results image id (ints for the synthetic set)."""
        return int(i)

    def get(self, i: int) -> Sample:
        s = self.size
        oh, ow = self._dims(i)
        img, masks, valid = self._scene(i, oh, ow)
        if (oh, ow) == (s, s):
            hw = np.array([s, s], np.int32)
            return Sample(img, masks, valid, hw, hw, name=f"synthetic_{i}")
        # Letterbox exactly like the decoders: bilinear image content,
        # center-convention nearest masks, top-left zero pad.
        from PIL import Image

        vh, vw = letterbox_params(oh, ow, s)
        img_lb = np.zeros((s, s, 3), np.uint8)
        img_lb[:vh, :vw] = np.asarray(
            Image.fromarray(img).resize((vw, vh), Image.BILINEAR))
        ys = np.minimum(((np.arange(vh) + 0.5) * (oh / vh)).astype(np.int64),
                        oh - 1)
        xs = np.minimum(((np.arange(vw) + 0.5) * (ow / vw)).astype(np.int64),
                        ow - 1)
        masks_lb = np.zeros((self.max_instances, s, s), np.uint8)
        masks_lb[:, :vh, :vw] = masks[:, ys[:, None], xs[None, :]]
        return Sample(
            img_lb, masks_lb, valid,
            np.array([oh, ow], np.int32), np.array([vh, vw], np.int32),
            name=f"synthetic_{i}")

    def get_orig_masks(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """Native-resolution GT: (masks (M, oh, ow) u8, valid (M,) u8)."""
        oh, ow = self._dims(i)
        _, masks, valid = self._scene(i, oh, ow)
        return masks, valid


class FolderDataset:
    """ILSO/SOC-style folder dataset: images + instance masks on disk.

    root/
      images/*.jpg|png
      masks/<stem>.png            (labeled: pixel value = instance id)   OR
      masks/<stem>/*.png          (one binary PNG per instance)
    """

    IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, root: str, image_size: int = 512,
                 max_instances: int = 8, split: str = "",
                 decode_backend: str = "auto"):
        self.root = root
        self.size = image_size
        self.max_instances = max_instances
        img_dir = os.path.join(root, "images")
        if split and os.path.isdir(os.path.join(root, split, "images")):
            img_dir = os.path.join(root, split, "images")
            root = os.path.join(root, split)
        self.img_dir = img_dir
        self.mask_dir = os.path.join(root, "masks")
        if not os.path.isdir(img_dir):
            raise FileNotFoundError(f"no images dir under {root}")
        self.names = sorted(
            f for f in os.listdir(img_dir)
            if f.lower().endswith(self.IMG_EXTS)
        )
        from basi_tpu.data.native import get_decoder
        self.decoder = get_decoder(decode_backend)

    def __len__(self) -> int:
        return len(self.names)

    def image_id(self, i: int):
        """COCO-results image id: all-digit stems (the COCO file naming
        convention) parse to ints, anything else stays a string."""
        stem = os.path.splitext(self.names[i])[0]
        return int(stem) if stem.isdecimal() else stem

    def get(self, i: int) -> Sample:
        name = self.names[i]
        stem = os.path.splitext(name)[0]
        img, (oh, ow) = self.decoder.decode_letterbox(
            os.path.join(self.img_dir, name), self.size
        )
        vh, vw = letterbox_params(oh, ow, self.size)
        kind, paths = self._mask_jobs(stem)
        if kind == "labeled":  # index-preserving decode (palette ids!)
            decoded = [decode_label_letterbox(paths[0], self.size)]
        else:
            decoded = []
            for p in paths:
                m, _ = self.decoder.decode_letterbox(p, self.size, nearest=True)
                decoded.append(m[..., 0] if m.ndim == 3 else m)
        masks, valid = self._assemble_masks(kind, decoded)
        return Sample(
            img, masks, valid,
            np.array([oh, ow], np.int32),
            np.array([vh, vw], np.int32),
            name=stem,
        )

    def _assemble_masks(self, kind: str, decoded: list[np.ndarray]):
        """Single source of truth for GT mask assembly (shared by ``get``
        and ``get_batch``): labeled-id expansion, >127 binarization,
        max_instances capping. ``decoded``: 2-D arrays, one per mask file."""
        masks = np.zeros((self.max_instances, self.size, self.size), np.uint8)
        count = 0
        if kind == "labeled":
            lab = decoded[0]
            for v in [v for v in np.unique(lab) if v > 0][: self.max_instances]:
                masks[count] = (lab == v).astype(np.uint8)
                count += 1
        elif kind == "per":
            for m in decoded[: self.max_instances]:
                masks[count] = (m > 127).astype(np.uint8)
                count += 1
        valid = np.zeros((self.max_instances,), np.uint8)
        valid[:count] = 1
        return masks, valid

    def _mask_jobs(self, stem: str) -> tuple[str, list[str]]:
        """(kind, mask file paths) for one sample; kind in
        {'labeled', 'per', 'none'}."""
        labeled = os.path.join(self.mask_dir, stem + ".png")
        per_dir = os.path.join(self.mask_dir, stem)
        if os.path.isfile(labeled):
            return "labeled", [labeled]
        if os.path.isdir(per_dir):
            return "per", [
                os.path.join(per_dir, f)
                for f in sorted(os.listdir(per_dir))[: self.max_instances]
            ]
        return "none", []

    def get_orig_masks(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """Native-resolution GT for original-frame AP matching: (masks
        (max_instances, oh, ow) u8, valid (M,) u8) — no letterboxing, same
        id-expansion/binarization rules as ``_assemble_masks``. Eval-path
        only (runs once per image), so plain PIL decode is fine here."""
        from PIL import Image

        stem = os.path.splitext(self.names[i])[0]
        kind, paths = self._mask_jobs(stem)
        decoded = []
        if kind == "labeled":
            with Image.open(paths[0]) as im:
                if im.mode not in ("P", "L", "I", "I;16"):
                    arr = np.asarray(im)
                    if arr.ndim == 3:
                        arr = arr[..., 0]
                else:
                    arr = np.asarray(im)
            decoded = [arr]
        else:
            for p in paths:
                with Image.open(p) as im:
                    a = np.asarray(im)
                decoded.append(a[..., 0] if a.ndim == 3 else a)
        if not decoded:
            img, (oh, ow) = self.decoder.decode_letterbox(
                os.path.join(self.img_dir, self.names[i]), self.size)
            return (np.zeros((self.max_instances, oh, ow), np.uint8),
                    np.zeros((self.max_instances,), np.uint8))
        oh, ow = decoded[0].shape[:2]
        masks = np.zeros((self.max_instances, oh, ow), np.uint8)
        count = 0
        if kind == "labeled":
            lab = decoded[0]
            for v in [v for v in np.unique(lab) if v > 0][: self.max_instances]:
                masks[count] = (lab == v).astype(np.uint8)
                count += 1
        else:
            for m in decoded[: self.max_instances]:
                masks[count] = (m > 127).astype(np.uint8)
                count += 1
        valid = np.zeros((self.max_instances,), np.uint8)
        valid[:count] = 1
        return masks, valid

    def get_batch(self, indices) -> list[Sample]:
        """Batch decode on the C++ thread pool (GIL-free): ONE call decodes
        every image in the batch concurrently, a second decodes all GT mask
        PNGs. Produces samples identical to per-item ``get`` (tested); the
        PIL fallback decoder has no batch API, so we fall back per item."""
        if not hasattr(self.decoder, "decode_letterbox_batch"):
            return [self.get(int(i)) for i in indices]
        names = [self.names[int(i)] for i in indices]
        stems = [os.path.splitext(n)[0] for n in names]
        imgs, hws = self.decoder.decode_letterbox_batch(
            [os.path.join(self.img_dir, n) for n in names], self.size)

        jobs = [self._mask_jobs(s) for s in stems]
        # Only per-instance binary masks go through the C++ batch decoder;
        # LABELED masks need the index-preserving path (palette ids would
        # be destroyed by the RGB conversion — see decode_label_letterbox).
        flat_paths = [p for kind, ps in jobs if kind == "per" for p in ps]
        if flat_paths:
            mask_imgs, _ = self.decoder.decode_letterbox_batch(
                flat_paths, self.size, nearest=True)
        out = []
        cursor = 0
        for si, (kind, ps) in enumerate(jobs):
            if kind == "labeled":
                decoded = [decode_label_letterbox(ps[0], self.size)]
            else:
                decoded = [mask_imgs[cursor + j][..., 0] for j in range(len(ps))]
                cursor += len(ps)
            masks, valid = self._assemble_masks(kind, decoded)
            oh, ow = int(hws[si][0]), int(hws[si][1])
            vh, vw = letterbox_params(oh, ow, self.size)
            out.append(Sample(
                imgs[si], masks, valid,
                np.array([oh, ow], np.int32),
                np.array([vh, vw], np.int32),
                name=stems[si],
            ))
        return out


def make_dataset(cfg_data, split: str | None = None):
    split = cfg_data.split if split is None else split
    if cfg_data.dataset == "synthetic":
        n = cfg_data.synthetic_n if split == "train" \
            else max(cfg_data.synthetic_n // 4, 1)
        return SyntheticDataset(
            n=n, image_size=cfg_data.image_size,
            max_instances=cfg_data.max_instances,
            seed=0 if split == "train" else 1,
            orig_max_scale=getattr(cfg_data, "synthetic_orig_scale", 1.0),
        )
    if cfg_data.dataset in ("ilso", "soc", "folder"):
        root = cfg_data.root or os.path.join("data", cfg_data.dataset)
        return FolderDataset(
            root, image_size=cfg_data.image_size,
            max_instances=cfg_data.max_instances, split=split,
            decode_backend=cfg_data.decode_backend,
        )
    if cfg_data.dataset == "coco":
        from basi_tpu.data.coco import CocoDataset

        root = cfg_data.root or os.path.join("data", "coco")
        return CocoDataset(
            root, image_size=cfg_data.image_size,
            max_instances=cfg_data.max_instances, split=split,
            decode_backend=cfg_data.decode_backend,
            ann_file=getattr(cfg_data, "ann_file", ""),
        )
    if cfg_data.dataset == "shards":
        from basi_tpu.data.shards import ShardDataset

        root = cfg_data.root
        if split and os.path.isdir(os.path.join(root, split)):
            root = os.path.join(root, split)
        return ShardDataset(root, image_size=cfg_data.image_size,
                            max_instances=cfg_data.max_instances)
    raise ValueError(f"unknown dataset {cfg_data.dataset!r}")


def iter_epoch(dataset, batch_size: int, shuffle: bool, seed: int,
               drop_last: bool = True,
               skip: int = 0,
               rows: np.ndarray | None = None) -> Iterator[dict[str, np.ndarray]]:
    """Host-side batch assembly (decode is delegated to the dataset).

    With ``drop_last=False`` the tail batch is padded to the static batch
    size by tiling its samples; ``num_real`` records how many leading
    samples are genuine so eval can skip the padded duplicates (padding
    must never be double-counted into AP/MAE — it exists only to keep the
    XLA program shape static).

    ``skip``: drop the first N *batches* at index level (mid-epoch resume)
    — the skipped batches are never decoded, and because the shuffled
    order depends only on (seed), the remaining schedule is exactly the
    one an uninterrupted epoch would have produced.

    ``rows``: positions WITHIN each global batch to materialize (sorted).
    Multi-host feeding (SURVEY §5.8): every process runs the identical
    (seed, epoch)-pure schedule, but decodes only the rows that land on
    its own devices — batch arrays then have leading dim ``len(rows)``
    while ``num_real`` still counts the GLOBAL batch's genuine samples.
    """
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    end = len(idx) - (len(idx) % batch_size if drop_last else 0)
    for start in range(skip * batch_size, end, batch_size):
        chunk = idx[start:start + batch_size]
        num_real = len(chunk)
        if num_real < batch_size:
            chunk = np.resize(chunk, batch_size)  # tiles, handles any ratio
        if rows is not None:
            chunk = chunk[rows]
        if hasattr(dataset, "get_batch"):
            samples = dataset.get_batch(chunk)
        else:
            samples = [dataset.get(int(i)) for i in chunk]
        yield {
            "image": np.stack([s.image for s in samples]),
            "masks": np.stack([s.masks for s in samples]),
            "valid": np.stack([s.valid for s in samples]),
            "orig_hw": np.stack([s.orig_hw for s in samples]),
            "valid_hw": np.stack([s.valid_hw for s in samples]),
            "num_real": np.int32(num_real),
            # dataset indices of the (possibly row-subset) samples — the
            # original-resolution AP path re-reads native GT by index
            "index": chunk.astype(np.int64),
        }
