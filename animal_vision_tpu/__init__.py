"""animal_vision_tpu — a TPU-native (JAX/XLA/Pallas) animal-vision framework.

A ground-up rebuild of the capabilities of Kyaw-Thiha/animal-vision
(reference mounted read-only at /root/reference) designed TPU-first:

- ``core``     : color / blur / geometry / stats / effects primitives in JAX,
                 numerically matched to the OpenCV+NumPy behavior of the
                 reference (golden-tested to >= 40 dB PSNR, usually ~1e-6).
- ``ops``      : Pallas TPU kernels for the hot paths.
- ``spectral`` : RGB -> hyperspectral reconstruction (analytic lobe model,
                 fused band integration so the HSI cube never materializes).
- ``species``  : declarative animal registry (20 non-UV dichromat mammals +
                 16 UV species) compiled into single jitted per-frame programs.
- ``models``   : Flax ports of the MST++ model zoo (RGB -> 31-band HSI).
- ``parallel`` : device-mesh sharding (dp / sp halo exchange / tp) via
                 jax.sharding + shard_map.
- ``pipeline`` : batched double-buffered frame executor.
- ``io``       : image / video / webcam renderers (OpenCV at the boundary).

Reference layer map: see /root/repo/SURVEY.md. Citations in docstrings point
at the reference implementation whose *behavior* each component reproduces.
"""

__version__ = "0.1.0"
