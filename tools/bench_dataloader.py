#!/usr/bin/env python
"""Data pipeline throughput benchmark: native C++ decode/resample vs PIL.

SURVEY.md §7 hard part #5 (data pipeline throughput): the reference feeds
4 GPUs from 10 torch DataLoader workers; this measures the per-image cost
of the decode+augment path that bounds TPU feed rate.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from PIL import Image

    from mgnet_tpu.data import native

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1024, 2048, 3), np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.png")
        Image.fromarray(img).save(path)

        def bench(fn, n=20, name=""):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            dt = (time.perf_counter() - t0) / n
            print(f"{name:34s} {dt * 1000:7.1f} ms/img "
                  f"({1 / dt:6.1f} img/s)")
            return dt

        print(f"native available: {native.native_available()}")

        def pil_decode():
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"))

        bench(pil_decode, name="PIL decode 1024x2048 PNG")
        bench(lambda: native.decode_image(path),
              name="native decode 1024x2048 PNG")

        import cv2

        bench(lambda: cv2.resize(img, (1024, 512),
                                 interpolation=cv2.INTER_LINEAR),
              name="cv2 bilinear resize -> 512x1024")
        bench(lambda: native.resize_bilinear(img, 512, 1024),
              name="native bilinear resize -> 512x1024")

        # threaded scaling: native decode releases the GIL, so the
        # prefetch loader's thread pool scales (torch-worker replacement)
        from concurrent.futures import ThreadPoolExecutor

        for workers in (1, 4, 8):
            def parallel_decode(n=16, w=workers):
                with ThreadPoolExecutor(w) as pool:
                    list(pool.map(lambda _: native.decode_image(path),
                                  range(n)))
            t0 = time.perf_counter()
            parallel_decode()
            dt = time.perf_counter() - t0
            print(f"native decode x16, {workers} threads    "
                  f"{dt * 1000:7.1f} ms total ({16 / dt:6.1f} img/s)")


if __name__ == "__main__":
    main()
