"""Benchmarks: the reference's renderSceneBox and renderSceneDragonBox
workloads on one TPU chip.

Replicates benchmark/main.cpp:34-57 (closed 2x2x2 box, 12 wall tris + 2
emissive ceiling tris, camera at (0,0,-3) aspect -1, 128x128 @ 256 spp) and
benchmark/main.cpp:59-105 (same box + the dragon mesh as glass IOR 1.5 —
the upstream asset is a missing LFS blob, so a procedural stand-in from
models/scenes.py is used, identically in the C++ baseline measurements).
Two dragon scales: the 200k-triangle stand-in and the FULL 7.2M-triangle
scale of the real xyzrgb_dragon asset (renderSceneDragonBoxFull).
Throughput uses the reference's items-processed convention:
width * height * spp primary samples per second (benchmark/main.cpp:30).

Baselines (vs_baseline denominators), measured on this machine's 4-core CPU
with the reference compiled -O3 (BASELINE.md; full-scale measured via
benchmarks/ref_dragon_bench.cpp on the identical synthetic mesh):
  * renderSceneBox 128x128 @ 256 spp:            0.883 Mrays/s
  * renderSceneDragonBox 128x128 @ 16 spp:       0.308 Mrays/s (200k)
  * renderSceneDragonBoxFull 128x128 @ 16 spp:   0.217 Mrays/s (7.2M)

Prints one JSON line per workload (the box metric last — the driver's
headline). On-chip parity verification (megakernel vs jnp wavefront,
binned traversal vs sweep, sorted-driver medians) runs BY DEFAULT before
the timings; a failure marks every metric line with an "error" field and
zeroes vs_baseline so a hardware regression can never ship a green
number. --no-verify skips it (quick local timing runs).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_CPU_BOX_MRAYS = 0.883
REFERENCE_CPU_DRAGON_MRAYS = 0.308
REFERENCE_CPU_DRAGON_FULL_MRAYS = 0.217

BOX_SIZE = 128
BOX_SPP = 256
BOX_SPP_CHUNK = 64
DRAGON_SIZE = 128
DRAGON_SPP = 16
DRAGON_TRIS = 200000
DRAGON_FULL_TRIS = 7_200_000
SCENE_CACHE = os.environ.get(
    "PTX_SCENE_CACHE", os.path.expanduser("~/.cache/cpupathtrace_tpu")
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _frame_fn(scene, camera, options, width, height, spp_chunk, n_chunks):
    from cpupathtrace_tpu.integrator.film import (
        morton_perm,
        pixel_camera_coords,
        render_chunk,
        use_pixel_order,
    )

    xg, yg = np.meshgrid(
        np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32)
    )
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    x_cam = jnp.asarray(x_cam, jnp.float32)
    y_cam = jnp.asarray(y_cam, jnp.float32)
    perm = None
    if use_pixel_order(scene):
        perm = jnp.asarray(morton_perm(xg.ravel(), yg.ravel()), jnp.int32)

    def frame(seed):
        key = jax.random.PRNGKey(seed)
        total = jnp.zeros((width * height, 4))
        count = jnp.zeros(width * height, jnp.int32)
        for k in jax.random.split(key, n_chunks):
            s, c = render_chunk(
                scene, camera, options, x_cam, y_cam, k, spp_chunk,
                pixel_order=perm,
            )
            total = total + s
            count = count + c
        return total, count

    return frame


def _best_recorded(metric):
    """Best value recorded for `metric` across the repo's BENCH_r*.json
    round archives (the regression reference, VERDICT r4 item 2)."""
    import glob

    best = None
    for path in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        for line in rec.get("tail", "").splitlines():
            if not line.startswith("{"):
                continue
            try:
                j = json.loads(line)
            except Exception:
                continue
            if j.get("metric") == metric and "error" not in j:
                v = j.get("value")
                if isinstance(v, (int, float)):
                    best = v if best is None else max(best, v)
    return best


def run_workload(name, scene, camera, options, width, height, spp,
                 spp_chunk, baseline, batches=3, frames_per_batch=3):
    frame = _frame_fn(
        scene, camera, options, width, height, spp_chunk, spp // spp_chunk
    )
    # Warmup/compile. Sync via host transfer: block_until_ready has been
    # observed to return early on the axon-tunneled backend.
    t0 = time.time()
    total, count = frame(0)
    np.asarray(total)
    compile_s = time.time() - t0

    # PIPELINED batches: enqueue `frames_per_batch` independent frames
    # back to back and sync ONCE, reporting total/N — the same
    # convention as the CPU baseline's google-benchmark-style timing
    # loop (benchmark/main.cpp real time per iteration = loop
    # wall / iterations; processJob is synchronous so its per-iteration
    # sync cost is zero). A per-frame host sync over the dev tunnel
    # costs ~30 ms that is NOT device time — it inflated the box
    # workload's recorded numbers by ~40% in rounds 1-4 and its
    # round-to-round drift is exactly the "regression" VERDICT r4
    # flagged. Batch medians + spread make the residual drift visible.
    batch_ms = []
    seed = 1
    for b in range(batches):
        t0 = time.time()
        outs = []
        for _ in range(frames_per_batch):
            outs.append(frame(seed))
            seed += 1
        # ONE sync: device execution is in-order, so the last frame's
        # film buffer being transferable implies every enqueued frame
        # finished (per-frame np.asarray pays a tunnel round trip each).
        np.asarray(outs[-1][0])
        dt = (time.time() - t0) / frames_per_batch
        batch_ms.append(dt)
        log(f"# {name} batch {b} ({frames_per_batch} frames pipelined): "
            f"{dt*1000:.1f} ms/frame ({width*height*spp/dt/1e6:.2f} Mrays/s)")
        total, count = outs[-1]

    img = np.asarray(total) / np.maximum(np.asarray(count), 1)[:, None]
    mean_rgb = float(img[:, :3].mean())
    log(f"# {name}: compile {compile_s:.1f}s, mean rgb {mean_rgb:.5f}, "
        f"alpha {float(img[:, 3].mean()):.3f}")

    med = float(np.median(batch_ms))
    spread = (max(batch_ms) - min(batch_ms)) / med if med else 0.0
    mrays = width * height * spp / med / 1e6
    mrays_best = width * height * spp / min(batch_ms) / 1e6
    res = {
        "metric": f"{name}_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 2),
        "best": round(mrays_best, 3),
        "spread_pct": round(100 * spread, 1),
        "batch_ms_per_frame": [round(t * 1000, 1) for t in batch_ms],
        "frames_per_batch": frames_per_batch,
    }
    prior = _best_recorded(res["metric"])
    if prior:
        res["vs_best_round"] = round(mrays / prior, 3)
        # Flag when the median sits below the best recorded round by more
        # than this run's own spread plus the documented 13% tunnel-drift
        # ceiling — i.e. a drop that drift cannot explain.
        if mrays < prior * (1.0 - max(spread, 0.13)):
            res["regression_suspected"] = True
            log(f"# {name}: REGRESSION SUSPECTED — median {mrays:.3f} vs "
                f"best recorded round {prior:.3f} "
                f"(spread {100*spread:.1f}%)")
    return res, compile_s


def roofline_binned(scene, camera, options, width, height, spp, frame_s):
    """One debug-visits pass of the sorted megakernel over the SAME ray
    population as the timed frames -> measured record/supercluster visit
    totals -> HBM/VPU fractions of v5e peak (utils/roofline.py model)."""
    from cpupathtrace_tpu.camera.camera import shoot_rays
    from cpupathtrace_tpu.integrator.film import (
        morton_perm,
        pixel_camera_coords,
    )
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )
    from cpupathtrace_tpu.utils.roofline import binned_frame_roofline

    xg, yg = np.meshgrid(
        np.arange(width, dtype=np.float32),
        np.arange(height, dtype=np.float32),
    )
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    perm = morton_perm(xg.ravel(), yg.ravel())
    xs = jnp.asarray(np.repeat(x_cam[perm], spp), jnp.float32)
    ys = jnp.asarray(np.repeat(y_cam[perm], spp), jnp.float32)
    rays = shoot_rays(
        camera, xs, ys, 1.0 / width, 1.0 / height, jax.random.PRNGKey(1)
    )
    # No outer jit: the sorted driver launches its (already-jitted) bounce
    # programs itself, and wrapping it would capture the multi-GB scene
    # tables as lowering constants (XLA hashes/serializes them — a 30+ min
    # stall at full scale; see render_chunk, which takes scene as an arg).
    _, _, vis = trace_megakernel_sorted(scene, rays, options, 1,
                                        debug_visits=True)
    vis = np.asarray(vis)  # [max_depth, blocks, 4]
    totals = vis.sum(axis=(0, 1))
    executed = int((vis.sum(axis=(1, 2)) > 0).sum())
    rec = scene.krn_records
    record_bytes = int(rec.shape[1] * rec.shape[2] * rec.dtype.itemsize)
    block_rows = int(os.environ.get("PTX_KRN_BLOCK_ROWS", "8"))
    return binned_frame_roofline(
        frame_s=frame_s,
        n_rays=width * height * spp,
        visits_totals=totals,
        executed_bounces=executed,
        record_bytes=record_bytes,
        record_tris=int(scene.krn_cluster_size),
        block_rows=block_rows,
    )


def run_box_grad(batches=3, frames_per_batch=5):
    """Gradient-pass throughput: loss + material gradients on the box
    workload (128x128 @ 16 spp per pass) through the TPU record-and-replay
    diff megakernel (integrator/diff_megakernel.py). The CPU reference has
    no differentiable rendering at all, so vs_baseline compares against
    its FORWARD box throughput — the gradient pass beating the CPU's
    plain render is the headline."""
    import jax.numpy as _jnp

    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.diff.render import get_material_params, loss_and_grad
    from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_camera

    scene = bench_box_scene()
    camera = bench_camera()
    spp = 16
    options = RenderOptions(
        BOX_SIZE, BOX_SIZE, spp, spp, epsilon=1e-3, max_depth=12
    )
    params = get_material_params(scene)
    target = _jnp.zeros((BOX_SIZE * BOX_SIZE, 4))
    key = jax.random.PRNGKey(5)

    # Sync via ONE host transfer of the last pass's loss:
    # block_until_ready can return early on the axon-tunneled backend
    # (BASELINE.md), and transferring every tiny grad leaf pays a
    # ~100 ms tunnel round trip each; device execution is in-order, so
    # the final scalar being ready implies every enqueued pass finished.
    def _sync(outs):
        np.asarray(outs[-1][0])

    t0 = time.time()
    loss, g = loss_and_grad(params, scene, camera, options, target, key, spp)
    _sync([(loss, g)])
    compile_s = time.time() - t0

    rays = BOX_SIZE * BOX_SIZE * spp
    batch_ms = []
    i = 0
    # One untimed warm batch: the first pipelined batch after compile
    # carries one-time dispatch/autotune cost (measured ~10x a steady
    # batch) that would otherwise dominate the spread.
    warm = [loss_and_grad(params, scene, camera, options, target,
                          jax.random.fold_in(key, 1000 + j), spp)
            for j in range(2)]
    _sync(warm)
    for b in range(batches):
        t0 = time.time()
        outs = []
        for _ in range(frames_per_batch):
            outs.append(loss_and_grad(
                params, scene, camera, options, target,
                jax.random.fold_in(key, i), spp,
            ))
            i += 1
        _sync(outs)
        dt = (time.time() - t0) / frames_per_batch
        batch_ms.append(dt)
        log(f"# renderSceneBoxGrad batch {b}: {dt*1000:.1f} ms/pass "
            f"({rays/dt/1e6:.2f} Mrays/s fwd+bwd)")
    med = float(np.median(batch_ms))
    mrays = rays / med / 1e6
    log(f"# renderSceneBoxGrad: compile {compile_s:.1f}s, "
        f"loss {float(loss):.5f}")
    res = {
        "metric": "renderSceneBoxGrad_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REFERENCE_CPU_BOX_MRAYS, 2),
        "spread_pct": round(
            100 * (max(batch_ms) - min(batch_ms)) / med, 1
        ),
        "batch_ms_per_frame": [round(t * 1000, 1) for t in batch_ms],
        "note": "loss+grad pass; baseline is the CPU reference's FORWARD "
                "box throughput (it has no differentiable rendering)",
    }
    prior = _best_recorded(res["metric"])
    if prior:
        res["vs_best_round"] = round(mrays / prior, 3)
    return res


def run_verify():
    """On-chip parity: the Pallas paths vs the jnp wavefront on real
    hardware (the interpret-mode tests cannot catch Mosaic-only bugs)."""
    from cpupathtrace_tpu.accel.pallas_traverse import (
        binned_intersect_ref,
        binned_intersect_tpu,
    )
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.core.rays import Rays
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel
    from cpupathtrace_tpu.integrator.wavefront import trace
    from cpupathtrace_tpu.models.scenes import (
        bench_box_scene,
        bench_dragon_scene,
    )

    ok = True

    # --- Binned traversal vs the jnp reference path, on-chip.
    scene = bench_dragon_scene(dragon_tris=20000, accel="binned")
    rng = np.random.default_rng(0)
    n = 16384
    o = rng.uniform(-0.95, 0.95, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_k, p_k = map(np.asarray, jax.jit(
        lambda o, d: binned_intersect_tpu(scene, o, d)
    )(o, d))
    t_r, p_r = map(np.asarray, jax.jit(
        lambda o, d: binned_intersect_ref(scene, o, d)
    )(o, d))
    same = (p_k == p_r) | (t_k == t_r)
    log(f"# verify binned-vs-sweep on-chip: {int(same.sum())}/{n} exact")
    ok &= bool(same.all())

    # --- Megakernel / sorted driver vs jnp wavefront: statistical parity
    # on the box scene. Single-run means of this estimator are HEAVY
    # TAILED (a path surviving k extra roulettes carries a 10^k weight
    # with 10^-k probability — reference semantics, worker.cpp:67-110):
    # measured per-run sd is up to ~14% of the mean for the threefry
    # wavefront. Compare MEDIANS over 8 seeds per tracer, which bounds the
    # comparison noise to a few percent while still catching the 9%-class
    # bias a weak PRNG seeding once produced here.
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )

    box = bench_box_scene()
    opts = RenderOptions(64, 64, 64, 64, epsilon=1e-3, max_depth=12)
    m = 65536
    og = np.zeros((m, 3), np.float32)
    og[:, 2] = -2.9
    xs = rng.uniform(-0.8, 0.8, m)
    ys = rng.uniform(-0.8, 0.8, m)
    dg = np.stack([xs, ys, np.ones(m)], -1).astype(np.float32)
    dg /= np.linalg.norm(dg, axis=1, keepdims=True)
    rays = Rays(origin=jnp.asarray(og), direction=jnp.asarray(dg))

    f_m = jax.jit(lambda r, sd: trace_megakernel(box, r, opts, sd)[0])
    f_s = jax.jit(lambda r, sd: trace_megakernel_sorted(box, r, opts, sd)[0])
    f_w = jax.jit(lambda r, k: trace(box, r, opts, k)[0])
    n_seeds = 8
    med_m = float(np.median([
        np.asarray(f_m(rays, jnp.int32(100 + 7 * i)))[:, :3].mean()
        for i in range(n_seeds)
    ]))
    med_s = float(np.median([
        np.asarray(f_s(rays, jnp.int32(500 + 13 * i)))[:, :3].mean()
        for i in range(n_seeds)
    ]))
    med_w = float(np.median([
        np.asarray(f_w(rays, jax.random.PRNGKey(i)))[:, :3].mean()
        for i in range(n_seeds)
    ]))
    rel = abs(med_m - med_w) / max(med_w, 1e-9)
    log(f"# verify megakernel-vs-wavefront on-chip: median {med_m:.5f} vs "
        f"{med_w:.5f} (rel {rel:.3f}, {n_seeds} seeds)")
    ok &= rel < 0.07
    rel_s = abs(med_s - med_m) / max(med_m, 1e-9)
    log(f"# verify sorted-vs-megakernel on-chip: median {med_s:.5f} vs "
        f"{med_m:.5f} (rel {rel_s:.3f})")
    ok &= rel_s < 0.07
    # Coverage of the closed box is exact for every tracer and seed.
    s_m = np.asarray(f_m(rays, jnp.int32(1234)))
    s_s = np.asarray(f_s(rays, jnp.int32(1234)))
    ok &= bool((s_s[:, 3] == s_m[:, 3]).all())

    # --- Differentiable path: the record-emitting forward must be
    # BIT-identical to the unsorted single-bounce driver, and the
    # reference replay must reconstruct the kernel's radiance sums
    # bit-for-bit from the records (the gradient metric's correctness
    # rests on exactly these two equalities).
    from cpupathtrace_tpu.integrator.diff_megakernel import (
        DIFF_FIELDS,
        em_material_ids,
        replay_spectrum,
        trace_megakernel_diff,
    )

    spec_d, _, recs = jax.jit(
        lambda r: trace_megakernel_diff(box, r, opts, 1234)
    )(rays)
    spec_u = jax.jit(
        lambda r: trace_megakernel_sorted(box, r, opts, 1234, sort=False)[0]
    )(rays)
    same_fwd = bool(np.array_equal(np.asarray(spec_d), np.asarray(spec_u)))
    mats = {fld: getattr(box, fld) for fld in DIFF_FIELDS}
    rep = np.asarray(replay_spectrum(
        mats, recs, em_material_ids(box), box.light_spectrum[:, :3],
        int(box.n_point_lights), int(box.emissive_sample_count),
    ))
    same_rep = bool(np.array_equal(rep, np.asarray(spec_d)[:, :3]))
    log(f"# verify diff-megakernel on-chip: forward bitwise "
        f"{'==' if same_fwd else '!='} driver, replay bitwise "
        f"{'==' if same_rep else '!='} kernel")
    ok &= same_fwd and same_rep
    return bool(ok)


def run_dragon_full(camera, results):
    """The reference's TRUE dragon benchmark scale: ~7.2M triangles
    (benchmark/main.cpp:59-105 loads the real xyzrgb_dragon). Lean build
    (megakernel tables only) + the scene-table cache (scene/cache.py)
    keep ingest off the timed path; build time and cache status are
    logged either way."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.models.scenes import bench_dragon_scene
    from cpupathtrace_tpu.scene.cache import build_cache_key, cached_build

    # Full-scale knobs (scoped: the 200k dragon keeps its own defaults):
    # the pair-record table budget must admit 7.2M tris, and 128-triangle
    # records keep the supercluster count under the megakernel cap.
    saved = {
        k: os.environ.get(k) for k in ("PTX_KRN_MAX_TRIS", "PTX_KRN_CLUSTER")
    }
    os.environ.setdefault("PTX_KRN_MAX_TRIS", str(9 * 10**6))
    os.environ.setdefault("PTX_KRN_CLUSTER", "128")
    try:
        t0 = time.time()
        key = build_cache_key(
            "dragonfull", DRAGON_FULL_TRIS, "binned", "lean"
        )
        scene, cache_hit = cached_build(
            key,
            lambda: bench_dragon_scene(
                dragon_tris=DRAGON_FULL_TRIS, accel="binned", lean=True
            ),
            SCENE_CACHE,
        )
        log(f"# dragon-full scene ready in {time.time()-t0:.1f}s "
            f"(cache {'HIT' if cache_hit else 'MISS — built fresh'}; "
            f"{scene.n_tri} tris, S={scene.krn_cl_bounds.shape[0]}, "
            f"L={scene.krn_cluster_size})")
        options = RenderOptions(
            DRAGON_SIZE, DRAGON_SIZE, DRAGON_SPP, DRAGON_SPP,
            epsilon=1e-3, max_depth=40,
        )
        res, _ = run_workload(
            "renderSceneDragonBoxFull", scene, camera, options,
            DRAGON_SIZE, DRAGON_SIZE, DRAGON_SPP, DRAGON_SPP,
            REFERENCE_CPU_DRAGON_FULL_MRAYS,
        )
        res["scene_build_s"] = round(time.time() - t0, 1)
        res["scene_cache_hit"] = cache_hit
        try:
            frame_s = DRAGON_SIZE * DRAGON_SIZE * DRAGON_SPP / (
                res["value"] * 1e6
            )
            res["roofline"] = roofline_binned(
                scene, camera, options, DRAGON_SIZE, DRAGON_SIZE,
                DRAGON_SPP, frame_s,
            )
            log(f"# renderSceneDragonBoxFull roofline: {res['roofline']}")
        except Exception as e:  # noqa: BLE001 — roofline is best-effort
            log(f"# roofline (dragonfull) failed: {type(e).__name__}: {e}")
        results.append(res)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true",
                    help="(default; kept for compatibility)")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the on-chip parity checks")
    ap.add_argument("--workloads", default="dragonfull,dragon,box,boxgrad")
    args = ap.parse_args()

    # Persistent compilation cache: the remote-compiled executables are
    # reused across bench runs (first compile takes minutes).
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.models.scenes import (
        bench_box_scene,
        bench_camera,
        bench_dragon_scene,
    )

    verify_ok = None
    if not args.no_verify:
        try:
            verify_ok = run_verify()
        except Exception as e:  # noqa: BLE001 — report, keep benching
            log(f"# verify CRASHED: {type(e).__name__}: {e}")
            verify_ok = False
        log(f"# verify: {'PASS' if verify_ok else 'FAIL'}")

    results = []
    camera = bench_camera()
    workloads = args.workloads.split(",")

    # Workloads are independent: a device fault in one (the tunnel has
    # died mid-run before) must not cost the other's metric line.
    if "dragonfull" in workloads:
        try:
            run_dragon_full(camera, results)
        except Exception as e:  # noqa: BLE001 — report, keep benching
            log(f"# renderSceneDragonBoxFull FAILED: {type(e).__name__}: {e}")

    if "dragon" in workloads:
        try:
            t0 = time.time()
            scene = bench_dragon_scene(dragon_tris=DRAGON_TRIS, accel="binned")
            log(f"# dragon scene built in {time.time()-t0:.1f}s "
                f"({scene.n_tri} tris, C={scene.trv_bounds.shape[0]}, "
                f"L={scene.cluster_size})")
            options = RenderOptions(
                DRAGON_SIZE, DRAGON_SIZE, DRAGON_SPP, DRAGON_SPP,
                epsilon=1e-3, max_depth=40,
            )
            res, _ = run_workload(
                "renderSceneDragonBox", scene, camera, options,
                DRAGON_SIZE, DRAGON_SIZE, DRAGON_SPP, DRAGON_SPP,
                REFERENCE_CPU_DRAGON_MRAYS,
            )
            try:
                frame_s = DRAGON_SIZE * DRAGON_SIZE * DRAGON_SPP / (
                    res["value"] * 1e6
                )
                res["roofline"] = roofline_binned(
                    scene, camera, options, DRAGON_SIZE, DRAGON_SIZE,
                    DRAGON_SPP, frame_s,
                )
                log(f"# renderSceneDragonBox roofline: {res['roofline']}")
            except Exception as e:  # noqa: BLE001
                log(f"# roofline (dragon) failed: {type(e).__name__}: {e}")
            results.append(res)
        except Exception as e:  # noqa: BLE001 — report, keep benching
            log(f"# renderSceneDragonBox FAILED: {type(e).__name__}: {e}")

    if "box" in workloads:
        try:
            scene = bench_box_scene()
            options = RenderOptions(
                BOX_SIZE, BOX_SIZE, BOX_SPP, BOX_SPP, epsilon=1e-3,
                max_depth=40,
            )
            res, _ = run_workload(
                "renderSceneBox", scene, camera, options,
                BOX_SIZE, BOX_SIZE, BOX_SPP, BOX_SPP_CHUNK,
                REFERENCE_CPU_BOX_MRAYS, frames_per_batch=8,
            )
            try:
                from cpupathtrace_tpu.utils.roofline import (
                    dense_frame_roofline,
                )

                # Dense scene: the whole frame is BOX_SPP/BOX_SPP_CHUNK
                # chunk launches; roofline is per-frame over all rays.
                frame_s = BOX_SIZE * BOX_SIZE * BOX_SPP / (
                    res["value"] * 1e6
                )
                res["roofline"] = dense_frame_roofline(
                    frame_s=frame_s,
                    n_rays=BOX_SIZE * BOX_SIZE * BOX_SPP,
                    n_prims=scene.n_prims,
                    executed_bounces=8,
                )
                log(f"# renderSceneBox roofline: {res['roofline']}")
            except Exception as e:  # noqa: BLE001
                log(f"# roofline (box) failed: {type(e).__name__}: {e}")
            results.append(res)
        except Exception as e:  # noqa: BLE001
            log(f"# renderSceneBox FAILED: {type(e).__name__}: {e}")

    if "boxgrad" in workloads:
        try:
            results.append(run_box_grad())
        except Exception as e:  # noqa: BLE001
            log(f"# renderSceneBoxGrad FAILED: {type(e).__name__}: {e}")

    # The box metric prints LAST: the driver records the final JSON line
    # as the round's headline.
    results.sort(
        key=lambda r: r["metric"] == "renderSceneBox_throughput"
    )

    for res in results:
        if verify_ok is not None:
            res["parity_verified"] = verify_ok
            if not verify_ok:
                # A failed hardware parity check invalidates the number:
                # flip the metric to an error so the recorded bench can
                # never report a regressed kernel as a green result.
                res["error"] = "on-chip parity verify FAILED"
                res["vs_baseline"] = 0.0
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
