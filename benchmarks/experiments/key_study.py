"""Key study: per-depth cluster/sup visit counts for SEVERAL coherence-key
variants, plus root-pregate statistics for nearest and shadow queries.
The (ray, cluster) entry matrix is order-independent, so it is computed
once per depth and every key variant is evaluated by permutation only."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from cpupathtrace_tpu.bsdf.bsdf import gather_material, propagate
from cpupathtrace_tpu.camera.camera import shoot_rays
from cpupathtrace_tpu.core.config import RenderOptions
from cpupathtrace_tpu.integrator.film import pixel_camera_coords
from cpupathtrace_tpu.models.scenes import bench_camera, bench_dragon_scene
from cpupathtrace_tpu.ops.intersect import scene_intersect
from cpupathtrace_tpu.ops.surface import surface_normal

W = H = 128
SPP = 4
DEPTHS = 7
BLOCK = 1024
LIGHT = np.array([0.0, 0.99, 0.0], np.float32)

t0 = time.time()
scene = bench_dragon_scene(dragon_tris=200000, accel="binned")
print(f"# scene built {time.time()-t0:.1f}s", flush=True)

clb = np.asarray(scene.krn_cl_bounds)
c_lo = clb[..., 0:3].reshape(-1, 3)
c_hi = clb[..., 3:6].reshape(-1, 3)
c_valid = clb[..., 6].reshape(-1) > 0.5
sup = np.asarray(scene.krn_sup_bounds)
s_lo, s_hi = sup[:, 0:3], sup[:, 3:6]
s_valid = sup[:, 6] > 0.5
root_lo = np.asarray(scene.root_lo)
root_hi = np.asarray(scene.root_hi)
# Scene-wide domain (box walls +- 1 plus the dragon root).
box_lo = np.minimum(root_lo, [-1, -1, -1]).astype(np.float32)
box_hi = np.maximum(root_hi, [1, 1, 1]).astype(np.float32)


def slab(o, d, lo, hi, valid=None):
    """entry t' [N, C] (clamped >= 0), inf on miss."""
    out = np.empty((o.shape[0], lo.shape[0]), np.float32)
    for i in range(0, o.shape[0], 2048):
        oc, dc = o[i:i + 2048], d[i:i + 2048]
        inv = 1.0 / np.where(
            np.abs(dc) < 1e-30, np.where(dc < 0, -1e-30, 1e-30), dc
        )
        t0s = (lo[None] - oc[:, None]) * inv[:, None]
        t1s = (hi[None] - oc[:, None]) * inv[:, None]
        tn = np.minimum(t0s, t1s).max(-1)
        tf = np.maximum(t0s, t1s).min(-1)
        miss = (tf < 0.0) | (tn > tf)
        if valid is not None:
            miss |= ~valid[None]
        out[i:i + 2048] = np.where(miss, np.inf, np.maximum(tn, 0.0))
    return out


def morton(p, lo, hi, bits):
    ext = np.maximum(hi - lo, 1e-30)
    cell = ((p - lo) / ext).clip(0.0, 0.9999) * (1 << bits)
    cell = cell.astype(np.int64)
    m = np.zeros(p.shape[0], np.int64)
    for b in range(bits):
        m |= ((cell[:, 0] >> b) & 1) << (3 * b + 2)
        m |= ((cell[:, 1] >> b) & 1) << (3 * b + 1)
        m |= ((cell[:, 2] >> b) & 1) << (3 * b)
    return m


def octant(d):
    return (
        (d[:, 0] < 0).astype(np.int64)
        + 2 * (d[:, 1] < 0)
        + 4 * (d[:, 2] < 0)
    )


def keys_for(o, d, alive, t_root):
    """dict name -> sortable key (dead rays always last)."""
    enters = np.isfinite(t_root)
    entry_pt = o + d * np.where(enters, t_root, 0.0)[:, None]
    ks = {
        "cur(m4 dragon+oct)": (morton(o, root_lo, root_hi, 4) << 3)
        | octant(d),
        "box m4+oct": (morton(o, box_lo, box_hi, 4) << 3) | octant(d),
        "box m5+oct": (morton(o, box_lo, box_hi, 5) << 3) | octant(d),
        "oct-major box m4": (octant(d) << 12)
        | morton(o, box_lo, box_hi, 4),
        "enters|oct|m4box": ((~enters).astype(np.int64) << 15)
        | (octant(d) << 12) | morton(o, box_lo, box_hi, 4),
        "enters|entrypt m4|oct": ((~enters).astype(np.int64) << 15)
        | (morton(entry_pt, root_lo, root_hi, 4) << 3) | octant(d),
        "enters|entrypt m4|octmaj": ((~enters).astype(np.int64) << 16)
        | (octant(d) << 12) | morton(entry_pt, root_lo, root_hi, 4),
    }
    for k in ks:
        ks[k] = np.where(alive, ks[k], np.int64(1) << 40)
    return ks


def block_stats(ent_c, ent_s, gate, perm=None):
    """(cluster visits, sup visits, blocks run) under row order `perm`."""
    if perm is not None:
        ent_c, ent_s, gate = ent_c[perm], ent_s[perm], gate[perm]
    nb = ent_c.shape[0] // BLOCK
    g = gate.reshape(nb, BLOCK).any(1)  # block runs the traversal at all
    bc = ent_c.reshape(nb, BLOCK, -1).any(1) & g[:, None]
    bs = ent_s.reshape(nb, BLOCK, -1).any(1) & g[:, None]
    return int(bc.sum()), int(bs.sum()), int(g.sum())


cam = bench_camera()
options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=DEPTHS)
xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                     np.arange(H, dtype=np.float32))
x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
rays = shoot_rays(cam, jnp.tile(jnp.asarray(x_cam), SPP),
                  jnp.tile(jnp.asarray(y_cam), SPP),
                  1.0 / W, 1.0 / H, jax.random.PRNGKey(0))
o = np.asarray(rays.origin)
d = np.asarray(rays.direction)
n = o.shape[0]
nb = n // BLOCK
alive = np.ones(n, bool)
rng = np.random.default_rng(0)
isect = jax.jit(lambda o, d, a: scene_intersect(scene, o, d, live=a))

tot = {}
shadow_tot = [0, 0]
for depth in range(DEPTHS):
    t0 = time.time()
    ent_c_t = slab(o, d, c_lo, c_hi, c_valid)
    ent_s_t = slab(o, d, s_lo, s_hi, s_valid)
    t_root = slab(o, d, root_lo[None], root_hi[None])[:, 0]
    gate = alive & np.isfinite(t_root)
    ent_c = np.isfinite(ent_c_t) & alive[:, None]
    ent_s = np.isfinite(ent_s_t) & alive[:, None]

    base = block_stats(ent_c, ent_s, gate)
    rows = [("unsorted", base)]
    for name, key in keys_for(o, d, alive, t_root).items():
        perm = np.argsort(key, kind="stable")
        rows.append((name, block_stats(ent_c, ent_s, gate, perm)))
    print(f"# depth {depth}: alive {int(alive.sum()):6d} "
          f"gated-in blocks {base[2]}/{nb}  [{time.time()-t0:.0f}s]",
          flush=True)
    for name, (vc, vs, g) in rows:
        tot.setdefault(name, [0, 0, 0])
        tot[name][0] += vc
        tot[name][1] += vs
        tot[name][2] += g
        print(f"#   {name:26s} cl {vc:6d}  sup {vs:5d}  blocks {g:4d}",
              flush=True)

    # one bounce
    t, prim = map(np.asarray, isect(jnp.asarray(o), jnp.asarray(d),
                                    jnp.asarray(alive)))
    hit = alive & (t >= 0.0)
    prim_safe = np.maximum(prim, 0)
    pos = o + d * t[:, None]

    # Shadow query stats at this vertex (one draw toward the ceiling).
    sd = LIGHT[None] - pos
    dist = np.linalg.norm(sd, axis=1)
    sdir = sd / np.maximum(dist, 1e-30)[:, None]
    t_sroot = slab(pos + sdir * 1e-3, sdir, root_lo[None], root_hi[None])[:, 0]
    sgate = hit & (t_sroot < dist)
    sg = sgate.reshape(nb, BLOCK).any(1)
    shadow_tot[0] += int(sg.sum())
    shadow_tot[1] += nb
    print(f"#   shadow blocks entering dragon: {int(sg.sum())}/{nb}",
          flush=True)

    nrm = np.asarray(surface_normal(scene, jnp.asarray(prim_safe),
                                    jnp.asarray(pos)))
    mat = gather_material(scene, jnp.asarray(prim_safe))
    u = jnp.asarray(rng.random((n, 3), np.float32))
    no, nd, _, _ = map(np.asarray, propagate(
        mat, jnp.asarray(d), jnp.asarray(pos), jnp.asarray(nrm), 1e-3, u))
    p_cont = 1.0 if depth + 1 <= 4 else 0.3
    alive = hit & (rng.random(n) < p_cont)
    o, dvec = no, nd
    d = dvec

print("# ==== totals over all depths ====", flush=True)
for name, (vc, vs, g) in tot.items():
    print(f"# {name:28s} cl {vc:7d}  sup {vs:6d}  blocks {g:5d}", flush=True)
print(f"# shadow gated-in blocks {shadow_tot[0]}/{shadow_tot[1]}", flush=True)
