"""Hardware harness: binned cluster-major traversal on the dragon scene.

Measures raw nearest-hit query throughput (coherent primary rays and
incoherent bounce-like rays) for the binned Pallas pipeline vs the jnp
sweep baseline, plus an exactness spot-check on-chip. Run on one TPU chip:

    python benchmarks/bench_traverse.py [--tris 200000] [--rays 262144]

Timings sync via host transfer (block_until_ready can return early over
the axon tunnel; see BASELINE.md).
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, warmup=1, iters=3, **kw):
    for _ in range(warmup):
        sync(fn(*args, **kw))
    best = 1e30
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args, **kw))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200000)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--cluster-size", type=int, default=None)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--check", action="store_true", help="exactness vs sweep")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpupathtrace_tpu.accel.pallas_traverse import binned_intersect_tpu
    from cpupathtrace_tpu.models.scenes import bench_dragon_scene
    from cpupathtrace_tpu.ops.intersect import sweep_intersect

    t0 = time.time()
    scene = bench_dragon_scene(
        dragon_tris=args.tris, accel="binned", cluster_size=args.cluster_size
    )
    print(
        f"[{time.time()-t0:6.1f}s] scene: {scene.n_tri} tris, "
        f"{scene.n_big} big, C={scene.trv_bounds.shape[0]}, "
        f"L={scene.cluster_size}", flush=True,
    )

    rng = np.random.default_rng(0)
    n = args.rays

    # Coherent primary-style rays: camera grid toward the room.
    g = int(np.sqrt(n))
    xs, ys = np.meshgrid(
        np.linspace(-1, 1, g, dtype=np.float32),
        np.linspace(-1, 1, g, dtype=np.float32),
    )
    o_c = np.zeros((g * g, 3), np.float32)
    o_c[:, 2] = -3.0
    d_c = np.stack(
        [xs.ravel() * 0.5, ys.ravel() * 0.5, np.ones(g * g, np.float32)], -1
    )
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    pad = n - g * g
    o_c = np.concatenate([o_c, o_c[:pad]])
    d_c = np.concatenate([d_c, d_c[:pad]])

    # Incoherent bounce-style rays: random wall points, random directions.
    o_i = rng.uniform(-0.99, 0.99, (n, 3)).astype(np.float32)
    d_i = rng.normal(size=(n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    fn = jax.jit(
        lambda o, d: binned_intersect_tpu(scene, o, d, m=args.m)
    )
    for name, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
        o, d = jnp.asarray(o), jnp.asarray(d)
        t0 = time.time()
        t, p = fn(o, d)
        sync(t)
        compile_s = time.time() - t0
        dt = timeit(fn, o, d)
        hits = int(np.sum(np.asarray(p) >= 0))
        print(
            f"binned {name}: {dt*1e3:8.2f} ms for {n} rays "
            f"({n/dt/1e6:7.2f} Mq/s), hits {hits} "
            f"[first+compile {compile_s:.1f}s]", flush=True,
        )

        if args.check:
            ns = 16384
            swfn = jax.jit(lambda o, d: sweep_intersect(scene, o, d))
            t_s, p_s = swfn(o[:ns], d[:ns])
            # Merge with the big set like the ref path does.
            from cpupathtrace_tpu.accel.pallas_traverse import _dense_part

            t_b, p_b = _dense_part(scene, o[:ns], d[:ns])
            t_s = jnp.where(t_s < 0, jnp.inf, t_s)
            better = t_s < t_b
            t_m = np.asarray(jnp.where(better, t_s, t_b))
            p_m = np.asarray(jnp.where(better, p_s, p_b))
            t_m = np.where(p_m >= 0, t_m, -1.0)
            tk = np.asarray(t)[:ns]
            pk = np.asarray(p)[:ns]
            same = (pk == p_m) | (tk == t_m)
            print(f"  exactness vs sweep ({ns} rays): {same.all()}"
                  + ("" if same.all() else f"  MISMATCHES {np.sum(~same)}"),
                  flush=True)

    # Shadow-style any-hit query toward the ceiling panel.
    tgt = np.zeros((n, 3), np.float32)
    tgt[:, 1] = 0.99
    tgt[:, 0] = rng.uniform(-0.25, 0.25, n)
    tgt[:, 2] = rng.uniform(-0.25, 0.25, n)
    dvec = tgt - o_i
    dist = np.linalg.norm(dvec, axis=1, keepdims=True)
    d_s = (dvec / dist).astype(np.float32)
    fn_sh = jax.jit(
        lambda o, d, tm: binned_intersect_tpu(
            scene, o, d, t_max=tm, any_hit=True, m=args.m
        )
    )
    o_j, d_j = jnp.asarray(o_i), jnp.asarray(d_s)
    tm = jnp.asarray(dist[:, 0] - 1e-3)
    sync(fn_sh(o_j, d_j, tm)[0])
    dt = timeit(fn_sh, o_j, d_j, tm)
    print(
        f"binned shadow:   {dt*1e3:8.2f} ms for {n} rays "
        f"({n/dt/1e6:7.2f} Mq/s)", flush=True,
    )


if __name__ == "__main__":
    main()
