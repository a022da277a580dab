"""Device-mesh parallelism: dp / sp (spatial) / tp shardings over ICI."""

from animal_vision_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_inference_fn,
)
