"""Time UV species at 1080p batch-8 on the real chip (probe for bench's
UV16 phase; same methodology by construction — utils/timing.time_chained).

Note (round-4 advisor): fps here, as in bench.py's UV16 snippet, is
TRANSFORMED-OUTPUT-ONLY — jitting ``prog(img)[1]`` lets XLA dead-code-
eliminate the baseline branch of the (baseline, out) visualize tuple.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from animal_vision_tpu.species import get_animal
from animal_vision_tpu.utils.timing import log, time_chained

NAMES = sys.argv[1:] or [
    "mantis_shrimp",
    "kestrel",
    "jumping_spider",
    "dragonfly",
    "hummingbird",
    "rat_uv",
]
B, H, W = 8, 1080, 1920

rng = np.random.default_rng(0)
frames = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(B, H, W, 3), dtype=np.uint8))
)
_ = float(jnp.sum(frames.astype(jnp.float32)[:1, :2, :2]))
log("[hb] device_put done")

for name in NAMES:
    animal = get_animal(name)
    prog = animal._program((H, W, 3), np.uint8, batched=True)
    wrapped = jax.jit(lambda img, p=prog: p(img)[1])
    best = time_chained(wrapped, frames, 10, tag=name)
    print(f"{name}: {1.0/best:.1f} fps", flush=True)
