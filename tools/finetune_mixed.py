"""Fine-tune the shipped synth-only checkpoint on the mixed curriculum.

VERDICT round-4 weak #4: the shipped ``synth_v1`` checkpoint scores 39.2 dB
in-distribution but only 26.5 dB on the held-out 1/f-spectrum + hard-edge
family (``train.xgen_scenes``) — in-distribution memorization. A from-scratch
mixed retrain (tools/train_synth.py --curriculum mixed) costs ~25 min; this
instead warm-starts from the shipped weights and runs a short low-LR pass
over BOTH families, which converges in a few hundred steps.

The swap is guarded: the fine-tuned weights replace the shipped checkpoint
only if eval-protocol xgen PSNR >= 30 dB AND synth PSNR >= 37 dB; otherwise
the candidate is left under ``synth_v1_mixed_candidate`` and the shipped
checkpoint is untouched (so a budget kill can never regress the bench
quality phase).

Usage: python tools/finetune_mixed.py [--steps 600] [--budget-s 420]
"""
import argparse
import os
import shutil
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--budget-s", type=float, default=420.0)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--scene-hw", type=int, default=160)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--src", default="animal_vision_tpu/models/pretrained/synth_v1")
    ap.add_argument("--min-xgen", type=float, default=30.0)
    ap.add_argument("--min-synth", type=float, default=37.0)
    args = ap.parse_args()

    from animal_vision_tpu.models import train as T
    from animal_vision_tpu.models.export import save_checkpoint
    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus, no_fused_ffn
    from animal_vision_tpu.models.quality import eval_protocol_fixtures, load_pretrained

    t0 = time.time()
    print("generating mixed scenes...", flush=True)
    half = max(2, args.scenes // 2)
    synth = T.synthetic_scenes(half, args.scene_hw, args.scene_hw, seed=0)
    xgen = T.xgen_scenes(half, args.scene_hw, args.scene_hw, seed=100)
    train_scenes = synth[:-1] + xgen[:-1]

    module = MSTPlusPlus()
    opt = T.make_optimizer(
        lr=args.lr, total_steps=args.steps, warmup=max(10, args.steps // 20)
    )
    state = T.init_state(module, opt, sample_shape=(1, args.patch, args.patch, 3))
    src = os.path.abspath(args.src)
    # Graft only the params: restoring the full saved TrainState would carry
    # the finished run's schedule count (lr pinned at end-of-cosine ~0).
    _, pre_params = load_pretrained()
    state = state._replace(params=pre_params)
    print(f"warm-started params from {src} ({time.time()-t0:.0f}s)", flush=True)
    step = jax.jit(T.make_train_step(module, opt, loss="l1"))

    @jax.jit
    def _apply(params, rgb):
        with no_fused_ffn():
            return module.apply(params, rgb[None])[0]

    def protocols(params):
        fn = lambda rgb: _apply(params, jnp.asarray(rgb))
        s = eval_protocol_fixtures(fn)
        x = eval_protocol_fixtures(fn, scene_fn=T.xgen_scenes, seed=11)
        return s, x

    s0, x0 = protocols(state.params)
    print(f"start: synth {s0} xgen {x0}", flush=True)

    rng = np.random.default_rng(7)
    CHUNK = 50
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

    s1, x1 = protocols(state.params)
    print(f"final: synth {s1} xgen {x1}", flush=True)

    cand = os.path.abspath(
        "animal_vision_tpu/models/pretrained/synth_v1_mixed_candidate"
    )
    if os.path.isdir(cand):
        shutil.rmtree(cand)
    save_checkpoint(cand, state)
    print(f"candidate saved {cand}", flush=True)

    if x1["psnr"] >= args.min_xgen and s1["psnr"] >= args.min_synth:
        bak = src + "_prev"
        if os.path.isdir(bak):
            shutil.rmtree(bak)
        os.rename(src, bak)
        os.rename(cand, src)
        shutil.rmtree(bak)
        print(
            f"SWAPPED: shipped checkpoint now mixed fine-tune "
            f"(synth {s1['psnr']:.2f} dB, xgen {x1['psnr']:.2f} dB)",
            flush=True,
        )
    else:
        print(
            f"KEPT shipped checkpoint (candidate synth {s1['psnr']:.2f}, "
            f"xgen {x1['psnr']:.2f} below gates "
            f"{args.min_synth}/{args.min_xgen})",
            flush=True,
        )


if __name__ == "__main__":
    main()
