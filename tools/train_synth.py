"""Train the full MST++ on the synthetic analytic-HSI curriculum until the
ARAD eval protocol clears >= 25 dB (VERDICT round-3 next #6), then save an
Orbax checkpoint under animal_vision_tpu/models/pretrained/ for the bench
quality phase to score.

``--curriculum mixed`` (the default since round 5) trains on BOTH scene
families — the smooth upsampled-noise family (train.synthetic_scenes) and
the 1/f-spectrum + hard-edge family (train.xgen_scenes) — so the shipped
checkpoint generalizes across generators instead of memorizing one input
distribution (VERDICT round-4 weak #4: xgen PSNR was 26.5 dB on a
synth-only checkpoint). Held-out eval reports both families separately.

Usage: python tools/train_synth.py [--steps 2000] [--budget-s 1200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--budget-s", type=float, default=1500.0)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--scene-hw", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="animal_vision_tpu/models/pretrained/synth_v1")
    ap.add_argument("--curriculum", choices=("synth", "mixed"), default="mixed")
    args = ap.parse_args()

    from animal_vision_tpu.models import eval as meval
    from animal_vision_tpu.models import train as T
    from animal_vision_tpu.models.export import save_checkpoint
    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus, no_fused_ffn
    from animal_vision_tpu.models.quality import eval_protocol_fixtures

    t0 = time.time()
    print("generating scenes...", flush=True)
    if args.curriculum == "mixed":
        half = max(2, args.scenes // 2)
        synth = T.synthetic_scenes(half, args.scene_hw, args.scene_hw, seed=0)
        xgen = T.xgen_scenes(half, args.scene_hw, args.scene_hw, seed=100)
        train_scenes = synth[:-1] + xgen[:-1]
        held = [synth[-1], xgen[-1]]
    else:
        scenes = T.synthetic_scenes(args.scenes, args.scene_hw, args.scene_hw, seed=0)
        train_scenes, held = scenes[:-2], scenes[-2:]

    module = MSTPlusPlus()  # full 3-stage model
    opt = T.make_optimizer(
        lr=args.lr, total_steps=args.steps, warmup=max(10, args.steps // 50)
    )
    state = T.init_state(module, opt, sample_shape=(1, args.patch, args.patch, 3))
    step = jax.jit(T.make_train_step(module, opt, loss="l1"))

    @jax.jit
    def _apply(params, rgb):
        with no_fused_ffn():
            return module.apply(params, rgb[None])[0]

    def eval_held(params):
        return meval.validate(
            lambda rgb: _apply(params, jnp.asarray(rgb)), held, crop=0
        )

    rng = np.random.default_rng(1)
    print(f"setup {time.time()-t0:.0f}s; training...", flush=True)
    CHUNK = 100
    done = 0
    while done < args.steps and time.time() - t0 < args.budget_s:
        brs, bhs = [], []
        for _ in range(CHUNK):
            rgb, hsi = train_scenes[int(rng.integers(0, len(train_scenes)))]
            br, bh = T.sample_patches(rng, rgb, hsi, args.patch, args.batch)
            brs.append(br)
            bhs.append(bh)
        brs = jax.device_put(jnp.asarray(np.stack(brs)))
        bhs = jax.device_put(jnp.asarray(np.stack(bhs)))
        last = None
        for i in range(CHUNK):
            state, m = step(state, brs[i], bhs[i])
            last = m["loss"]
        done += CHUNK
        print(
            f"  step {done}: loss {float(last):.4f} ({time.time()-t0:.0f}s)",
            flush=True,
        )
        if done % 500 == 0 or done >= args.steps:
            hm = eval_held(state.params)
            print(
                f"  held-out: psnr {hm['psnr']:.2f} mrae {hm['mrae']:.4f}",
                flush=True,
            )

    for fam, scene in zip(("synth", "xgen")[: len(held)], held):
        hm = meval.validate(
            lambda rgb: _apply(state.params, jnp.asarray(rgb)), [scene], crop=0
        )
        print(f"final held-out [{fam}] psnr {hm['psnr']:.2f} dB", flush=True)

    apply_fn = lambda rgb: _apply(state.params, jnp.asarray(rgb))
    proto = eval_protocol_fixtures(apply_fn)
    print(f"eval protocol (synth): {proto}", flush=True)
    proto_x = eval_protocol_fixtures(apply_fn, scene_fn=T.xgen_scenes, seed=11)
    print(f"eval protocol (xgen): {proto_x}", flush=True)

    out = os.path.abspath(args.out)
    save_checkpoint(out, state)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
