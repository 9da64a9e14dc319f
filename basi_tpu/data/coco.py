"""COCO-format instance-segmentation dataset (no pycocotools).

The driver's fifth benchmark config names a "COCO instance-seg stretch
run" (BASELINE.md config 5); this loader feeds COCO-style annotation
files through the same ``Sample`` contract the ILSO/SOC folder datasets
use, so every downstream stage (batch assembly, device feed, train step,
eval, original-resolution AP) works unchanged.

Implemented from the COCO data spec directly (this image has no
pycocotools): polygon segmentations rasterize via PIL's polygon fill;
RLE segmentations decode both the uncompressed ``counts: [int, ...]``
form and the compressed LEB128-style string form (5 data bits per byte,
offset 48, sign-extended, delta-coded from the second pair on),
column-major as the spec defines. GT masks build at ORIGINAL resolution
(so ``get_orig_masks`` supports ``infer.ap_at_original``) and letterbox
to the model frame with the same center-convention nearest sampling the
other datasets use.

Instance selection: annotations sort by pixel area, largest first — the
salient-instance framing of COCO scenes — and cap at ``max_instances``;
``iscrowd`` regions are skipped by default (they are stuff-like union
masks, not instances).

Expected layout (standard COCO):
  root/annotations/instances_<split>.json   (or data.ann_file)
  root/<split>/*.jpg                        (or root/images)
"""

from __future__ import annotations

import json
import os

import numpy as np

from basi_tpu.data.datasets import Sample, letterbox_params


def rle_decompress(s: str | bytes) -> list[int]:
    """COCO compressed RLE string -> run counts (column-major runs)."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: list[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(counts: list[int], h: int, w: int) -> np.ndarray:
    """Run counts (alternating 0-runs/1-runs, COLUMN-major) -> (h, w) u8."""
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    if pos != h * w:
        raise ValueError(f"RLE covers {pos} px, mask is {h}x{w}={h * w}")
    return flat.reshape(w, h).T  # column-major per the COCO spec


def mask_to_counts(mask: np.ndarray) -> list[int]:
    """(h, w) binary mask -> run counts (column-major, starts with the
    0-run — the exact inverse of :func:`rle_to_mask`). Vectorized: run
    boundaries come from one diff over the flattened columns."""
    flat = (np.asarray(mask) > 0).astype(np.uint8).T.reshape(-1)
    if flat.size == 0:
        return [0]
    edges = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate(([0], edges, [flat.size]))
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:  # counts must start with a (possibly empty) 0-run
        counts.insert(0, 0)
    return counts


def rle_compress(counts: list[int]) -> str:
    """Run counts -> COCO compressed RLE string (delta + 5-bit LEB, the
    inverse of :func:`rle_decompress`)."""
    s = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return s.decode("ascii")


def mask_to_rle(mask: np.ndarray) -> dict:
    """(h, w) binary mask -> COCO segmentation dict
    ``{"size": [h, w], "counts": <compressed str>}`` — the format
    pycocotools' ``COCO.loadRes`` / ``maskUtils.decode`` accept, so
    predictions exported with this round-trip through the official COCO
    tooling."""
    h, w = np.asarray(mask).shape
    return {"size": [int(h), int(w)],
            "counts": rle_compress(mask_to_counts(mask))}


def polygons_to_mask(polys: list[list[float]], h: int, w: int) -> np.ndarray:
    """Union of filled polygons -> (h, w) u8 (PIL even-odd fill per ring)."""
    from PIL import Image, ImageDraw

    im = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(im)
    for poly in polys:
        if len(poly) >= 6:  # at least 3 points
            draw.polygon([(poly[i], poly[i + 1])
                          for i in range(0, len(poly) - 1, 2)],
                         outline=1, fill=1)
    return np.asarray(im, np.uint8)


def segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    """Any COCO ``segmentation`` value -> (h, w) u8 binary mask."""
    if isinstance(seg, dict):
        counts = seg["counts"]
        if isinstance(counts, (str, bytes)):
            counts = rle_decompress(counts)
        sh, sw = seg.get("size", (h, w))
        if (sh, sw) != (h, w):
            raise ValueError(f"RLE size {(sh, sw)} != image size {(h, w)}")
        return rle_to_mask(list(counts), h, w)
    return polygons_to_mask(seg, h, w)


def _letterbox_masks_nearest(masks: np.ndarray, size: int) -> np.ndarray:
    """(M, oh, ow) -> (M, size, size) with the shared center-convention
    nearest sampling (identical to SyntheticDataset/native decoder)."""
    m, oh, ow = masks.shape
    vh, vw = letterbox_params(oh, ow, size)
    ys = np.minimum(((np.arange(vh) + 0.5) * (oh / vh)).astype(np.int64),
                    oh - 1)
    xs = np.minimum(((np.arange(vw) + 0.5) * (ow / vw)).astype(np.int64),
                    ow - 1)
    out = np.zeros((m, size, size), np.uint8)
    out[:, :vh, :vw] = masks[:, ys[:, None], xs[None, :]]
    return out


class CocoDataset:
    """COCO-JSON instance dataset behind the shared ``Sample`` contract."""

    def __init__(self, root: str, image_size: int = 512,
                 max_instances: int = 8, split: str = "val",
                 decode_backend: str = "auto", ann_file: str = "",
                 include_crowd: bool = False):
        self.root = root
        self.size = image_size
        self.max_instances = max_instances
        self.include_crowd = include_crowd

        ann = ann_file or self._find_annotations(root, split)
        self.ann_path = ann  # native-GT cache key (data/native_gt.py)
        with open(ann) as f:
            doc = json.load(f)

        by_image: dict[int, list[dict]] = {}
        for a in doc.get("annotations", []):
            if a.get("iscrowd", 0) and not include_crowd:
                continue
            if not a.get("segmentation"):
                continue
            by_image.setdefault(a["image_id"], []).append(a)

        # Image directory candidates: root/<split>, the COCO-year
        # convention derived from the annotation file name
        # (instances_val2017.json -> root/val2017), root/images, root.
        # Pick the FIRST candidate that actually contains an annotated
        # image — mere existence is not enough (an empty root/val dir, or
        # root/annotations when the ann file has no instances_ prefix,
        # must not shadow the real image dir).
        ann_suffix = os.path.splitext(os.path.basename(ann))[0]
        ann_suffix = ann_suffix.removeprefix("instances_")
        probe_names = {im["file_name"] for im in doc.get("images", [])
                       if im["id"] in by_image}
        cands = []
        for c in (split, ann_suffix, "images", ""):
            d = os.path.join(root, c) if c else root
            if os.path.isdir(d) and d not in cands:
                cands.append(d)

        def has_any(d: str) -> bool:
            # One listdir per candidate (ALL annotated names are checked,
            # so a partial download whose early names are missing still
            # resolves to the right dir).
            try:
                return any(n in probe_names for n in os.listdir(d))
            except OSError:
                return False

        img_dir = next((d for d in cands if has_any(d)),
                       cands[0] if cands else root)
        self.img_dir = img_dir

        # Keep only images that exist on disk AND have instances; sort by
        # file name so the epoch order is stable across hosts.
        self.images = sorted(
            (im for im in doc.get("images", [])
             if im["id"] in by_image
             and os.path.isfile(os.path.join(img_dir, im["file_name"]))),
            key=lambda im: im["file_name"])
        self.anns = by_image
        if by_image and not probe_names:
            raise ValueError(
                f"annotations reference {len(by_image)} image_ids but none "
                f"appear in the JSON's 'images' list ({ann!r} is "
                f"inconsistent)")
        if by_image and probe_names and not self.images:
            # Every annotated image missing on disk = a wrong image dir,
            # not an empty dataset; failing here beats the misleading
            # "shrink data.batch_size" error a 0-length dataset causes.
            raise FileNotFoundError(
                f"annotations reference {len(by_image)} images but none "
                f"were found under any of {cands or [root]} "
                f"(root={root!r}, split={split!r})")

        from basi_tpu.data.native import get_decoder

        self.decoder = get_decoder(decode_backend)

    @staticmethod
    def _find_annotations(root: str, split: str) -> str:
        ann_dir = os.path.join(root, "annotations")
        if os.path.isdir(ann_dir):
            def matches(f: str) -> bool:
                # Anchored: instances_<split>[year].json. A bare substring
                # test would let split='val' pick instances_minival.json
                # or split='train' pick instances_trainval.json.
                if not (f.startswith("instances_") and f.endswith(".json")):
                    return False
                stem = f[len("instances_"):-len(".json")]
                rest = stem[len(split):]
                return stem.startswith(split) and (not rest or rest.isdigit())
            cands = sorted(f for f in os.listdir(ann_dir) if matches(f))
            if cands:
                return os.path.join(ann_dir, cands[0])
        raise FileNotFoundError(
            f"no COCO annotations for split {split!r} under {ann_dir} "
            f"(set data.ann_file explicitly)")

    def __len__(self) -> int:
        return len(self.images)

    def _orig_masks(self, im: dict) -> tuple[np.ndarray, np.ndarray]:
        oh, ow = int(im["height"]), int(im["width"])
        anns = self.anns[im["id"]]
        # Largest-first: the salient-instance reading of a COCO scene; the
        # cap keeps the most prominent objects.
        anns = sorted(anns, key=lambda a: -float(a.get("area", 0.0)))
        masks = np.zeros((self.max_instances, oh, ow), np.uint8)
        valid = np.zeros((self.max_instances,), np.uint8)
        count = 0
        # Truncate AFTER dropping empty rasterizations: a degenerate
        # annotation (e.g. <3-point polygon) must not evict a real
        # instance below the max_instances cap.
        for a in anns:
            if count == self.max_instances:
                break
            m = segmentation_to_mask(a["segmentation"], oh, ow)
            if not m.any():
                continue
            masks[count] = m
            valid[count] = 1
            count += 1
        return masks, valid

    def image_id(self, i: int) -> int:
        """The TRUE COCO image id from the annotation JSON — results
        exported with it load directly into pycocotools COCOeval against
        the original annotation file."""
        return int(self.images[i]["id"])

    def get(self, i: int) -> Sample:
        im = self.images[i]
        img, (oh, ow) = self.decoder.decode_letterbox(
            os.path.join(self.img_dir, im["file_name"]), self.size)
        if (oh, ow) != (int(im["height"]), int(im["width"])):
            raise ValueError(
                f"{im['file_name']}: file is {oh}x{ow} but the annotation "
                f"says {im['height']}x{im['width']}")
        masks_o, valid = self._orig_masks(im)
        masks = _letterbox_masks_nearest(masks_o, self.size)
        vh, vw = letterbox_params(oh, ow, self.size)
        return Sample(
            img, masks, valid,
            np.array([oh, ow], np.int32), np.array([vh, vw], np.int32),
            name=os.path.splitext(im["file_name"])[0],
        )

    def get_batch(self, indices) -> list[Sample]:
        """Images batch-decode on the C++ thread pool; GT rasterization is
        pure numpy/PIL per item (no files to decode)."""
        if not hasattr(self.decoder, "decode_letterbox_batch"):
            return [self.get(int(i)) for i in indices]
        ims = [self.images[int(i)] for i in indices]
        imgs, hws = self.decoder.decode_letterbox_batch(
            [os.path.join(self.img_dir, im["file_name"]) for im in ims],
            self.size)
        out = []
        for si, im in enumerate(ims):
            oh, ow = int(hws[si][0]), int(hws[si][1])
            if (oh, ow) != (int(im["height"]), int(im["width"])):
                raise ValueError(
                    f"{im['file_name']}: file is {oh}x{ow} but the "
                    f"annotation says {im['height']}x{im['width']}")
            masks_o, valid = self._orig_masks(im)
            masks = _letterbox_masks_nearest(masks_o, self.size)
            vh, vw = letterbox_params(oh, ow, self.size)
            out.append(Sample(
                imgs[si], masks, valid,
                np.array([oh, ow], np.int32), np.array([vh, vw], np.int32),
                name=os.path.splitext(im["file_name"])[0],
            ))
        return out

    def get_orig_masks(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """Native-resolution GT for ``infer.ap_at_original``."""
        return self._orig_masks(self.images[i])
