"""Host input-pipeline benchmark: decode+letterbox images/sec on this host.

Compares the PIL fallback path against the native C++ core (libjpeg decode
+ letterbox across the ``native`` thread pool) — the replacement for the
reference's DataLoader worker processes (CVC-YOLOv3/train.py:124-141).
NOTE: this host has a single CPU core, so the pool shows no thread scaling
here; the native win is decode+resize efficiency per core.

Prints one JSON line: {"pil_imgs_per_s": N, "native_imgs_per_s": N, ...}
"""

import io
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image


def main(n_images=64, size=(1024, 768), out=(416, 416)):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import native

    from mit_driverless_cv_traininginfra_tpu.data.decode import open_rgb

    rng = np.random.default_rng(0)
    blobs = []
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(n_images):
            arr = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
            p = os.path.join(td, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)
            with open(p, "rb") as f:
                blobs.append(f.read())

        # PIL: decode + letterbox-equivalent resize
        t0 = time.perf_counter()
        for p in paths:
            img = Image.open(p).convert("RGB")
            img.resize(out, Image.BILINEAR)
        pil_rate = n_images / (time.perf_counter() - t0)

        # seam (native decode when built, PIL geometry)
        t0 = time.perf_counter()
        for p in paths:
            open_rgb(p).resize(out, Image.BILINEAR)
        seam_rate = n_images / (time.perf_counter() - t0)

        nat_rate = None
        if native.available():
            native.decode_letterbox_batch(blobs[:4], out[1], out[0])  # warm
            t0 = time.perf_counter()
            _, fails = native.decode_letterbox_batch(blobs, out[1], out[0],
                                                     n_threads=8)
            nat_rate = n_images / (time.perf_counter() - t0)
            assert fails == 0

    print(json.dumps({
        "metric": "host_decode_letterbox_imgs_per_s",
        "n_images": n_images,
        "src_size": list(size),
        "pil_imgs_per_s": round(pil_rate, 1),
        "seam_imgs_per_s": round(seam_rate, 1),
        "native_batch_imgs_per_s": (round(nat_rate, 1)
                                    if nat_rate is not None else None),
        "native_active": native.available(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
