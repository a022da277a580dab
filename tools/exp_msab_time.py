"""Profile the packed full-res MST++ pipeline: per-level MSAB pass A / pass
B, the packed convs, one whole packed MST stage, and the end-to-end model —
so README's stage breakdown (VERDICT round-2 weak #2) is measured, not
guessed. Chained-dispatch timing with a scalar sync (block_until_ready does
not block on the axon tunnel)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def chain(fn, x, iters=20):
    """Time fn by feeding its output back (same shape in/out)."""
    y = fn(x)
    _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = fn(y)
        _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    from animal_vision_tpu.ops import fused_msab as F

    rng = np.random.default_rng(0)

    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    H0, W0 = 1088, 1920
    for name, H, W, c, p in [
        ("L0", H0, W0, 31, 4),
        ("L1", H0 // 2, W0 // 2, 62, 2),
        ("L2", H0 // 4, W0 // 4, 124, 1),
    ]:
        heads = c // 31
        pc = p * c
        wq_n = W // p
        # on-device build: a host device_put of this size takes minutes
        # over the axon tunnel
        xp = jax.jit(
            lambda k: jax.random.normal(k, (H, wq_n, pc), jnp.float32) * 0.3
        )(jax.random.PRNGKey(0))
        _ = float(jnp.sum(xp[:1, :1]))
        attn_w = {
            "to_q": mk(c, c), "to_k": mk(c, c), "to_v": mk(c, c),
            "rescale": mk(heads, 1, 1, scale=1.0),
            "proj_kernel": mk(c, c), "proj_bias": mk(c, scale=0.0),
            "pos_emb_0": mk(3, 3, 1, c), "pos_emb_2": mk(3, 3, 1, c),
        }
        ln_w = (jnp.ones((c,)), jnp.zeros((c,)))
        ffn_w = (mk(1, 1, c, 4 * c), mk(3, 3, 1, 4 * c), mk(4 * c, c).reshape(1, 1, 4 * c, c))

        t = F._pick_t(H, c)
        eye = jnp.eye(p, dtype=jnp.float32)
        kron = lambda m: jnp.kron(eye, m.astype(jnp.float32))
        wq_p, wk_p = kron(attn_w["to_q"]), kron(attn_w["to_k"])
        f_stats = jax.jit(lambda a: F._attn_stats(a, wq_p, wk_p, t))
        ta = timeit(f_stats, xp)
        f_blk = jax.jit(
            lambda a: F.msab_packed(a, attn_w, ln_w, ffn_w, heads=heads, c=c, p=p)
        )
        tblk = chain(f_blk, xp)
        gb = xp.size * 4 / 1e9
        print(
            f"{name} ({H}x{W} c={c} p={p}, t={t}): passA {ta:.2f} ms  "
            f"msab(A+glue+B) {tblk:.2f} ms  passB~{tblk - ta:.2f} ms  "
            f"(x {gb * 1e3:.0f} MB; 2-pass floor@150GB/s {2 * gb / 0.15 * 1e3:.2f} ms)"
        )

    # packed convs at L0
    xp = jax.jit(
        lambda k: jax.random.normal(k, (H0, W0 // 4, 124), jnp.float32) * 0.3
    )(jax.random.PRNGKey(1))
    _ = float(jnp.sum(xp[:1, :1]))
    k33 = mk(3, 3, 31, 31, scale=0.1)
    f = jax.jit(lambda v: F.packed_conv3x3(v, k33, 31, 4))
    print(f"packed conv3x3 31->31 @L0: {chain(f, xp):.2f} ms")
    k44 = mk(4, 4, 31, 62, scale=0.1)
    fd = jax.jit(lambda v: F.packed_down4x4(v, k44, 31, 4))
    print(f"packed down4x4 31->62 @L0: {timeit(fd, xp):.2f} ms")

    # one full packed MST stage + the full model
    from animal_vision_tpu.models.mst_plus_plus import MST, MSTPlusPlus

    mst = MST(dim=31, stage=2, num_blocks=(1, 1, 1))
    v = mst.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 31)))
    sw = mst.apply(v, None, weights_only=True)
    f_stage = jax.jit(lambda a: F.mst_stage_packed(a, sw))
    print(f"mst_stage_packed @1080p: {chain(f_stage, xp):.2f} ms")

    model = MSTPlusPlus()
    x = jax.jit(
        lambda k: jax.random.uniform(k, (1, 1080, 1920, 3), jnp.float32)
    )(jax.random.PRNGKey(2))
    _ = float(jnp.sum(x[:, :1, :1]))
    vm = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    f_model = jax.jit(lambda a: model.apply(vm, a))
    tm = timeit(f_model, x, iters=5)
    print(f"MST++ full-res 1080p: {tm:.2f} ms/frame")


if __name__ == "__main__":
    main()
