"""End-to-end drive on the REAL TPU vs the NumPy/cv2 oracles (the /verify
recipe): render a real reference image through species whose code paths
changed this round and PSNR-check against tests/oracles_uv.py ground truth.

Usage: python tools/drive_verify.py [species ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def psnr(a, b):
    a = np.asarray(a, np.float64) / 255.0
    b = np.asarray(b, np.float64) / 255.0
    mse = np.mean((a - b) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def main():
    import cv2

    import oracles_uv
    from animal_vision_tpu.species import get_animal

    names = sys.argv[1:] or ["mantis_shrimp", "goldfish"]
    img = cv2.cvtColor(
        cv2.imread("/root/reference/images/gallery_UV.png"), cv2.COLOR_BGR2RGB
    )
    img = cv2.resize(img, (640, 360), interpolation=cv2.INTER_AREA)
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    ok = True
    for name in names:
        t0 = time.time()
        animal = get_animal(name)
        base, out = animal.visualize(img)
        oracle_fn = getattr(oracles_uv, f"{name}_pipeline")
        want = oracle_fn(img)
        if isinstance(want, tuple):
            want = want[1]
        p = psnr(out, want)
        status = "OK " if p >= 40.0 else "FAIL"
        ok &= p >= 40.0
        print(f"{status} {name}: psnr {p:.1f} dB vs oracle ({time.time()-t0:.0f}s)", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
