"""Stage ablation for the slow UV species at 1080p: time the full program,
then variants with individual render stages disabled, to find where the
milliseconds go before optimizing (VERDICT round-3 next #4/#5).

Each variant subclasses the species and stubs one stage; timing is the
bench's chained-dispatch clock (scalar-sync, batch 8).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BATCH = 8
H, W = 1080, 1920


def timeit(prog, frames, iters=20):
    y = prog(frames)
    _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        y = frames
        for _ in range(iters):
            y = prog(y)
        _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
        best = min(best, (time.perf_counter() - t0) / (iters * BATCH))
    return best * 1e3


def time_animal(animal, frames, tag):
    prog = animal._program((H, W, 3), np.uint8, batched=True)
    wrapped = jax.jit(lambda img, p=prog: p(img)[1])
    ms = timeit(wrapped, frames)
    print(f"  {tag}: {ms:.2f} ms ({1e3 / ms:.0f} fps)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(BATCH, H, W, 3), dtype=np.uint8))
    )
    _ = float(jnp.sum(frames.astype(jnp.float32)[:1, :2, :2]))

    from animal_vision_tpu.core import blur, effects
    from animal_vision_tpu.species.uv.mantis_shrimp import MantisShrimp

    print("mantis_shrimp stage ablation (1080p):", flush=True)
    time_animal(MantisShrimp(), frames, "full")

    class NoPeriph(MantisShrimp):
        periph_blur_sigma = 0.0

    class NoPanorama(MantisShrimp):
        panorama_scale = 1.0

    class NoPct(MantisShrimp):
        def _render(self, baseline_lin, maps):
            import animal_vision_tpu.core.stats as stats

            orig = stats.percentile
            stats.percentile = lambda x, q: jnp.float32(0.5)
            try:
                import animal_vision_tpu.species.uv.mantis_shrimp as m

                orig2 = m.percentile
                m.percentile = lambda x, q: jnp.float32(0.5)
                try:
                    return super()._render(baseline_lin, maps)
                finally:
                    m.percentile = orig2
            finally:
                stats.percentile = orig

    class NoBarcode(MantisShrimp):
        barcode_opacity = 0.0

        def _render(self, baseline_lin, maps):
            # keep stats/weights but skip the einsum+saturation block
            out = super()._render(baseline_lin, maps)
            return out

    class NoUnsharp(MantisShrimp):
        unsharp_amount = 0.0

        def _render(self, baseline_lin, maps):
            return super()._render(baseline_lin, maps)

    class MapsOnly(MantisShrimp):
        def _render(self, baseline_lin, maps):
            return jnp.clip(maps[..., :3], 0.0, 1.0)

    class BaselineOnly(MantisShrimp):
        def _render(self, baseline_lin, maps):
            return jnp.clip(baseline_lin + 0.0 * maps[..., :1], 0.0, 1.0)

    class NoBlurs(MantisShrimp):
        pre_soft_sigma = 0.0
        periph_blur_sigma = 0.0
        unsharp_amount = 0.0

    for cls, tag in [
        (NoPeriph, "no_peripheral_blur"),
        (NoPanorama, "no_panorama_warp"),
        (NoPct, "no_percentile"),
        (NoUnsharp, "no_unsharp(keeps pol)"),
        (NoBlurs, "no_blurs_at_all"),
        (MapsOnly, "maps_only(skip render)"),
        (BaselineOnly, "baseline_only(skip maps use)"),
    ]:
        try:
            time_animal(cls(), frames, tag)
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)

    # how much does the (H, W, 10) upsample itself cost?
    from animal_vision_tpu.core import color, geometry
    from animal_vision_tpu.species.uv.common import band_weight_columns
    from animal_vision_tpu.spectral import classic

    m = MantisShrimp()
    cols = band_weight_columns(m.lambdas, m._band_specs())
    g = classic.lobe_matrix(tuple(float(v) for v in np.asarray(m.lambdas)))
    hs, ws = 270, 480

    def maps_prog(img):
        img01 = color.to_float01(img)
        lin = color.srgb_to_linear(img01)
        small = geometry.resize(lin, (hs, ws), "area")
        lin2 = color.srgb_to_linear(small)
        cube = jnp.einsum("...c,cb->...b", lin2, jnp.asarray(g), precision="highest")
        cube = jnp.maximum(cube, 0.0)
        mp = jnp.einsum("...b,bn->...n", cube, jnp.asarray(cols), precision="highest")
        up = geometry.resize(mp, (H, W), "linear")
        return jnp.sum(up, axis=-1)  # force materialization

    prog = jax.jit(jax.vmap(maps_prog))
    ms = timeit(prog, frames)
    print(f"  maps+upsample alone: {ms:.2f} ms", flush=True)

    def pct_prog(img):
        from animal_vision_tpu.core.stats import percentile

        x = img[..., 0].astype(jnp.float32)
        big = jnp.concatenate([x[..., None]] * 10, axis=-1) * (1.0 / 255.0)
        return percentile(big, 95.0) * jnp.ones((4, 4), jnp.uint8)

    prog = jax.jit(jax.vmap(pct_prog))
    ms = timeit(prog, frames)
    print(f"  percentile over (H,W,10) alone: {ms:.2f} ms", flush=True)


def main_rat():
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(BATCH, H, W, 3), dtype=np.uint8))
    )
    _ = float(jnp.sum(frames.astype(jnp.float32)[:1, :2, :2]))

    from animal_vision_tpu.species.uv.rat_uv import RatUV

    print("rat_uv stage ablation (1080p):", flush=True)
    time_animal(RatUV(), frames, "full(auto)")

    class DayOnly(RatUV):
        mode = "day"

    class NightOnly(RatUV):
        mode = "night"

    class Scale025(RatUV):
        hsi_scale = 0.25

    class NoPanorama(RatUV):
        panorama_scale = 1.0

    class NoPct(RatUV):
        def _render(self, baseline_lin, maps):
            import animal_vision_tpu.species.uv.rat_uv as m

            orig = m.percentile
            m.percentile = lambda x, q: jnp.float32(0.5)
            try:
                return super()._render(baseline_lin, maps)
            finally:
                m.percentile = orig

    class NoScatter(RatUV):
        def _render_mode(self, composited, night):
            from animal_vision_tpu.core import effects

            orig = effects.scatter_and_blue_bias
            effects.scatter_and_blue_bias = lambda x, sigma, blue_bias: x
            try:
                return super()._render_mode(composited, night)
            finally:
                effects.scatter_and_blue_bias = orig

    class MapsOnly(RatUV):
        def _render(self, baseline_lin, maps):
            return jnp.clip(maps[..., :3], 0.0, 1.0)

    class BaselineOnly(RatUV):
        def _render(self, baseline_lin, maps):
            return jnp.clip(baseline_lin + 0.0 * maps[..., :1], 0.0, 1.0)

    for cls, tag in [
        (DayOnly, "day_only(single branch)"),
        (NightOnly, "night_only"),
        (Scale025, "hsi_scale_0.25"),
        (NoPanorama, "no_panorama_warp"),
        (NoPct, "no_percentile"),
        (NoScatter, "no_scatter_blur"),
        (MapsOnly, "maps_only(skip render)"),
        (BaselineOnly, "baseline_only(skip maps use)"),
    ]:
        try:
            time_animal(cls(), frames, tag)
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    import sys as _sys

    if "rat" in _sys.argv[1:]:
        main_rat()
    else:
        main()
