"""Image decode backends: native C++ (libjpeg+SIMD-ish) with PIL fallback.

SURVEY §2.16: the reference leans on libjpeg-turbo via PIL inside DataLoader
worker *processes*; our native path is a C++ shared library (built from
``basi_tpu/data/_native/``) that decodes + bilinear-letterboxes JPEG/PNG
into caller-owned uint8 buffers while releasing the GIL, so a host thread
pool overlaps decode with TPU compute (no fork, no pickling).

``get_decoder('auto')`` prefers the native library and silently falls back
to PIL if the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbasi_decode.so")

_build_lock = threading.Lock()


class PILDecoder:
    """Fallback decoder using PIL (same letterbox semantics as native)."""

    name = "pil"

    def decode_letterbox(self, path: str, size: int, nearest: bool = False):
        from PIL import Image

        with Image.open(path) as im:
            if im.mode not in ("RGB", "L"):
                im = im.convert("RGB")
            ow, oh = im.size
            from basi_tpu.data.datasets import letterbox_params
            vh, vw = letterbox_params(oh, ow, size)
            resample = Image.NEAREST if nearest else Image.BILINEAR
            im = im.resize((vw, vh), resample)
            arr = np.asarray(im)
        if arr.ndim == 2:
            arr = arr[..., None]
        canvas = np.zeros((size, size, arr.shape[2]), np.uint8)
        canvas[:vh, :vw] = arr
        if canvas.shape[2] == 1:
            canvas = np.repeat(canvas, 3, axis=2)
        return canvas, (oh, ow)


class NativeDecoder:
    """ctypes binding to the C++ decode library."""

    name = "native"

    def __init__(self, lib_path: str = _LIB_PATH):
        self.lib = ctypes.CDLL(lib_path)
        self.lib.basi_decode_letterbox.restype = ctypes.c_int
        self.lib.basi_decode_letterbox.argtypes = [
            ctypes.c_char_p,  # path
            ctypes.c_int,  # target size
            ctypes.c_int,  # nearest flag
            ctypes.POINTER(ctypes.c_ubyte),  # out buffer size*size*3
            ctypes.POINTER(ctypes.c_int),  # out orig_h
            ctypes.POINTER(ctypes.c_int),  # out orig_w
        ]
        self.lib.basi_decode_batch.restype = ctypes.c_int
        self.lib.basi_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,  # n
            ctypes.c_int,  # target size
            ctypes.c_int,  # nearest flag
            ctypes.POINTER(ctypes.c_ubyte),  # out (n, size, size, 3)
            ctypes.POINTER(ctypes.c_int),  # hw (n, 2)
            ctypes.c_int,  # threads
        ]

    def decode_letterbox(self, path: str, size: int, nearest: bool = False):
        out = np.zeros((size, size, 3), np.uint8)
        oh = ctypes.c_int(0)
        ow = ctypes.c_int(0)
        rc = self.lib.basi_decode_letterbox(
            path.encode(), size, int(nearest),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.byref(oh), ctypes.byref(ow),
        )
        if rc != 0:
            raise IOError(f"native decode failed ({rc}) for {path}")
        return out, (oh.value, ow.value)

    def decode_letterbox_batch(self, paths: list[str], size: int,
                               nearest: bool = False, threads: int = 0):
        """Decode many files concurrently on the C++ thread pool (GIL-free;
        decode.cc basi_decode_batch). Returns (out (n, size, size, 3) u8,
        hw (n, 2) i32). This is the hot ingest path — at the 1k imgs/s/chip
        target, single-threaded host decode is the bottleneck (SURVEY §7
        hard part #4)."""
        n = len(paths)
        if n == 0:
            return (np.zeros((0, size, size, 3), np.uint8),
                    np.zeros((0, 2), np.int32))
        out = np.zeros((n, size, size, 3), np.uint8)
        hw = np.zeros((n, 2), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        threads = threads or min(os.cpu_count() or 1, n)
        fails = self.lib.basi_decode_batch(
            arr, n, size, int(nearest),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            threads,
        )
        if fails:
            bad = [p for p, (h, w) in zip(paths, hw) if h == 0 and w == 0]
            raise IOError(f"native batch decode: {fails} failures, e.g. {bad[:3]}")
        return out, hw


def build_native(verbose: bool = False) -> str | None:
    """Compile the native decoder if needed; returns lib path or None."""
    with _build_lock:
        src = os.path.join(_NATIVE_DIR, "decode.cc")
        if not os.path.isfile(src):
            return None
        if os.path.isfile(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
        import subprocess

        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            src, "-o", _LIB_PATH, "-ljpeg", "-lpng", "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
            return _LIB_PATH
        except Exception:
            return None


def decode_benchmark(n: int = 64, size: int = 512, threads: int = 0) -> dict:
    """Measure host decode throughput (SURVEY §7 hard part #4: at 1k
    imgs/s/chip the host JPEG decode becomes the bottleneck)."""
    import os
    import tempfile
    import time

    import numpy as np

    from PIL import Image

    threads = threads or (os.cpu_count() or 1)
    d = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    path = os.path.join(d, "bench.jpg")
    Image.fromarray(img).save(path, quality=90)

    results = {}
    for name, dec in (("native", get_decoder("native")),
                      ("pil", PILDecoder())):
        t0 = time.perf_counter()
        for _ in range(n):
            dec.decode_letterbox(path, size)
        dt = time.perf_counter() - t0
        results[f"{name}_imgs_per_s"] = round(n / dt, 1)

    # native threaded batch API
    lib = NativeDecoder().lib
    import ctypes

    paths = (ctypes.c_char_p * n)(*([path.encode()] * n))
    out = np.zeros((n, size, size, 3), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    t0 = time.perf_counter()
    fails = lib.basi_decode_batch(
        paths, n, size, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads,
    )
    dt = time.perf_counter() - t0
    assert fails == 0
    results[f"native_batch_t{threads}_imgs_per_s"] = round(n / dt, 1)

    # Same numbers through the ACTUAL pipeline (FolderDataset.get_batch ->
    # iter_epoch), not just the raw C API: images + labeled GT masks.
    from PIL import Image as _Image

    from basi_tpu.data.datasets import FolderDataset, iter_epoch

    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    os.makedirs(os.path.join(d, "masks"), exist_ok=True)
    lab = np.zeros((480, 640), np.uint8)
    lab[100:300, 100:300] = 1
    for i in range(n):
        os.link(path, os.path.join(d, "images", f"im{i:04d}.jpg"))
        _Image.fromarray(lab).save(os.path.join(d, "masks", f"im{i:04d}.png"))
    ds = FolderDataset(d, image_size=size, max_instances=4,
                       decode_backend="native")
    t0 = time.perf_counter()
    count = sum(b["image"].shape[0]
                for b in iter_epoch(ds, 16, shuffle=False, seed=0))
    dt = time.perf_counter() - t0
    results["pipeline_imgs_per_s"] = round(count / dt, 1)
    return results


def get_decoder(backend: str = "auto"):
    if backend in ("auto", "native"):
        path = build_native()
        if path:
            try:
                return NativeDecoder(path)
            except OSError:
                pass
        if backend == "native":
            raise RuntimeError("native decoder requested but unavailable")
    return PILDecoder()


if __name__ == "__main__":
    import json

    print(json.dumps(decode_benchmark()))
