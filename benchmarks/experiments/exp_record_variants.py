"""Time the record-test variants: serial fori vs pairwise matmul (MXU) vs
pairwise outer-product (VPU). 128 tris x 1024 rays per record, VMEM-resident
tables (no DMA), K record tests per kernel launch.

Feature encoding (Plucker MT):
  det   = -d.N                 (N = e1 x e2)
  u_num = m.e2 + d.(v0 x e2)   (m = o x d)
  v_num = -m.e1 - d.(v0 x e1)
  t_num = o.N - v0.N
  u = u_num/det, v = v_num/det, t = t_num/det  (verified vs classic MT below)
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NREC = 32
K = 512          # record tests per launch
T = 128          # tris per record
EPS = 1e-6
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------- host packing
def make_tables(rng, nrec):
    v0 = rng.uniform(-1, 1, (nrec, T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (nrec, T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (nrec, T, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    v0xe2 = np.cross(v0, e2)
    v0xe1 = np.cross(v0, e1)
    d0 = (v0 * n).sum(-1)

    # matmul table pf [16, 5*T]: rows d(0:3) m(3:6) o(6:9) one(9)
    pf = np.zeros((nrec, 16, 5 * T), np.float32)
    pf[:, 0:3, 0 * T:1 * T] = -n.transpose(0, 2, 1)            # det
    pf[:, 3:6, 1 * T:2 * T] = e2.transpose(0, 2, 1)            # u: m.e2
    pf[:, 0:3, 1 * T:2 * T] = v0xe2.transpose(0, 2, 1)         # u: d.(v0 x e2)
    pf[:, 3:6, 2 * T:3 * T] = -e1.transpose(0, 2, 1)           # v
    pf[:, 0:3, 2 * T:3 * T] = -v0xe1.transpose(0, 2, 1)
    pf[:, 6:9, 3 * T:4 * T] = n.transpose(0, 2, 1)             # t
    pf[:, 9, 3 * T:4 * T] = -d0
    pf[:, 9, 4 * T:5 * T] = 0.0                                # cull (none)

    # outer-product table: [T, 16] feats per tri
    op = np.zeros((nrec, T, 16), np.float32)
    op[:, :, 0:3] = -n
    op[:, :, 3:6] = e2
    op[:, :, 6:9] = v0xe2
    op[:, :, 9:12] = -e1
    # (v0xe1 reuses 6:9? no) -> 12:15
    op[:, :, 12:15] = -v0xe1
    # t feats: n (0:3 negated -> reuse -n) and d0
    op[:, :, 15] = d0

    # serial table rows (24 x T like the real record)
    ser = np.zeros((nrec, 24, T), np.float32)
    ser[:, 0:3] = v0.transpose(0, 2, 1)
    ser[:, 3:6] = e1.transpose(0, 2, 1)
    ser[:, 6:9] = e2.transpose(0, 2, 1)
    ser[:, 10] = np.arange(T)[None, :]
    return pf, op, ser, (v0, e1, e2)


def make_rays(rng):
    o = rng.uniform(-2, 2, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    comps = [o[:, i].reshape(8, 128) for i in range(3)] + [
        d[:, i].reshape(8, 128) for i in range(3)
    ]
    return o, d, comps


# ---------------------------------------------------------------- kernels
def _ray_feats(ox, oy, oz, dx, dy, dz):
    """A [8, 16, 128]: rows d(0:3) m(3:6) o(6:9) one(9)."""
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    rows = [dx, dy, dz, mx, my, mz, ox, oy, oz, one] + [zero] * 6
    return jnp.stack(rows, axis=1)  # [8, 16, 128]


def kernel_matmul(pf_ref, rays_ref, bt_out, *, k_iters, extract):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    A = _ray_feats(ox, oy, oz, dx, dy, dz)

    def body(k, bt):
        pf = pf_ref[k % NREC]  # [16, 5T]
        new_rows = []
        su_keep = sv_keep = sd_keep = None
        for j in range(8):
            C = jax.lax.dot_general(
                pf, A[j], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [5T, 128]
            det = C[0 * T:1 * T]
            un = C[1 * T:2 * T]
            vn = C[2 * T:3 * T]
            tn = C[3 * T:4 * T]
            sgn = jnp.where(det >= 0, 1.0, -1.0)
            sd = det * sgn
            su = un * sgn
            sv = vn * sgn
            st = tn * sgn
            inside = jnp.minimum(jnp.minimum(su, sv), sd - su - sv)
            ok = (inside >= 0.0) & (st >= 0.0) & (sd > EPS)
            tv = st / jnp.where(ok, sd, 1.0)
            bt_row = bt[j:j + 1, :]  # [1,128]
            okf = ok & (tv < bt_row)
            key = jnp.where(okf, tv, jnp.float32(np.inf))
            tmin = jnp.min(key, axis=0, keepdims=True)  # [1, 128]
            new_rows.append(jnp.minimum(bt_row, tmin))
            if extract and j == 0:
                su_keep, sv_keep, sd_keep = su, sv, sd
                key0, tmin0 = key, tmin
        if extract:
            onehot = (key0 == tmin0).astype(jnp.float32)
            suw = jnp.sum(onehot * su_keep, axis=0, keepdims=True)
            svw = jnp.sum(onehot * sv_keep, axis=0, keepdims=True)
            sdw = jnp.sum(onehot * sd_keep, axis=0, keepdims=True)
            uw = suw / jnp.maximum(sdw, 1e-30)
            vw = svw / jnp.maximum(sdw, 1e-30)
            corr = 1e-12 * (uw + vw)
            new_rows[0] = new_rows[0] + corr
        return jnp.concatenate(new_rows, axis=0)

    bt0 = jnp.full((8, 128), 100.0, jnp.float32)
    bt_out[:] = jax.lax.fori_loop(0, k_iters, body, bt0)


def kernel_outer(op_ref, rays_ref, bt_out, *, k_iters):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx

    def body(k, bt):
        tb = op_ref[k % NREC]  # [T, 16]
        cols = [tb[:, i:i + 1] for i in range(16)]
        new_rows = []
        for j in range(8):
            rj = lambda a: a[j:j + 1, :]
            djx, djy, djz = rj(dx), rj(dy), rj(dz)
            mjx, mjy, mjz = rj(mx), rj(my), rj(mz)
            ojx, ojy, ojz = rj(ox), rj(oy), rj(oz)
            det = cols[0] * djx + cols[1] * djy + cols[2] * djz
            un = (cols[3] * mjx + cols[4] * mjy + cols[5] * mjz
                  + cols[6] * djx + cols[7] * djy + cols[8] * djz)
            vn = (cols[9] * mjx + cols[10] * mjy + cols[11] * mjz
                  + cols[12] * djx + cols[13] * djy + cols[14] * djz)
            tn = (-cols[0] * ojx - cols[1] * ojy - cols[2] * ojz) - cols[15]
            sgn = jnp.where(det >= 0, 1.0, -1.0)
            sd = det * sgn
            su = un * sgn
            sv = vn * sgn
            st = tn * sgn
            inside = jnp.minimum(jnp.minimum(su, sv), sd - su - sv)
            ok = (inside >= 0.0) & (st >= 0.0) & (sd > EPS)
            tv = st / jnp.where(ok, sd, 1.0)
            bt_row = rj(bt)
            okf = ok & (tv < bt_row)
            key = jnp.where(okf, tv, jnp.float32(np.inf))
            tmin = jnp.min(key, axis=0, keepdims=True)
            new_rows.append(jnp.minimum(bt_row, tmin))
        return jnp.concatenate(new_rows, axis=0)

    bt0 = jnp.full((8, 128), 100.0, jnp.float32)
    bt_out[:] = jax.lax.fori_loop(0, k_iters, body, bt0)


def kernel_serial(ser_ref, rays_ref, bt_out, *, k_iters):
    """Current-style: SMEM record, serial fori over tris."""
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

    def body(k, bt):
        def tri(i, bt):
            scr = ser_ref
            r = k % 4  # small SMEM-resident table
            v0x, v0y, v0z = scr[r, 0, i], scr[r, 1, i], scr[r, 2, i]
            e1x, e1y, e1z = scr[r, 3, i], scr[r, 4, i], scr[r, 5, i]
            e2x, e2y, e2z = scr[r, 6, i], scr[r, 7, i], scr[r, 8, i]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            miss = jnp.abs(det) <= EPS
            inv = 1.0 / jnp.where(miss, 1.0, det)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (~miss & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                  & (t >= 0) & (t < bt))
            return jnp.where(ok, t, bt)

        return jax.lax.fori_loop(0, T, tri, bt)

    bt0 = jnp.full((8, 128), 100.0, jnp.float32)
    bt_out[:] = jax.lax.fori_loop(0, k_iters, body, bt0)


def run_variant(name, kernel, table, comps, smem=False, **kw):
    rays = jnp.stack([jnp.asarray(c) for c in comps])  # [6, 8, 128]
    spec_tbl = pl.BlockSpec(
        memory_space=pltpu.SMEM if smem else pltpu.VMEM
    )

    def make(k_iters):
        kw2 = dict(kw, k_iters=k_iters)

        @jax.jit
        def go(tbl, rays):
            return pl.pallas_call(
                functools.partial(kernel, **kw2),
                in_specs=[spec_tbl, pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(tbl, rays)

        return go

    # Tunnel latency dominates one launch (~34 ms); time the DELTA between
    # two in-kernel iteration counts.
    k_lo, k_hi = 2048, 16384
    go_lo, go_hi = make(k_lo), make(k_hi)
    tbl = jnp.asarray(table)
    t0 = time.time()
    r = np.asarray(go_lo(tbl, rays))
    np.asarray(go_hi(tbl, rays))
    comp = time.time() - t0
    best_lo = best_hi = 1e30
    for _ in range(3):
        t0 = time.time()
        r = np.asarray(go_lo(tbl, rays))
        best_lo = min(best_lo, time.time() - t0)
        t0 = time.time()
        np.asarray(go_hi(tbl, rays))
        best_hi = min(best_hi, time.time() - t0)
    per_rec = (best_hi - best_lo) / (k_hi - k_lo) * 1e6
    print(f"# {name:24s} compile {comp:5.1f}s  lo {best_lo*1e3:7.2f} ms "
          f"hi {best_hi*1e3:8.2f} ms -> {per_rec:6.2f} us/record   "
          f"bt_mean={r.mean():.4f}")
    return r


rng = np.random.default_rng(0)
pf, op, ser, (v0, e1, e2) = make_tables(rng, NREC)
o, d, comps = make_rays(rng)

# host check: Plucker == classic MT on record 0
m = np.cross(o, d)
det = -(d @ np.cross(e1[0], e2[0]).T)
un = m @ e2[0].T + d @ np.cross(v0[0], e2[0]).T
vn = -(m @ e1[0].T) - d @ np.cross(v0[0], e1[0]).T
tn = (o @ np.cross(e1[0], e2[0]).T) - (v0[0] * np.cross(e1[0], e2[0])).sum(-1)
# classic
p = np.cross(d[:, None, :], e2[0][None, :, :])
detc = (p * e1[0][None]).sum(-1)
tt = o[:, None, :] - v0[0][None]
uc = (tt * p).sum(-1)
q = np.cross(tt, e1[0][None, :, :])
vc = (d[:, None, :] * q).sum(-1)
tc = (q * e2[0][None]).sum(-1)
for a, b, nm in [(det, detc, "det"), (un, uc, "u"), (vn, vc, "v"), (tn, tc, "t")]:
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
    print(f"# plucker-vs-classic {nm}: rel {rel:.2e}")

run_variant("serial-smem", kernel_serial, ser[:4], comps, smem=True,
            k_iters=K)
run_variant("outer-vpu", kernel_outer, op, comps, k_iters=K)
run_variant("matmul-mxu", kernel_matmul, pf, comps, k_iters=K, extract=False)
run_variant("matmul-mxu+extract", kernel_matmul, pf, comps, k_iters=K,
            extract=True)
