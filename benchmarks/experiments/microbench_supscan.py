"""How much does the sup-tier pair-slab pass cost per query?
Amplifies pair_slab_entries([Sp,128] bounds, rows) + flag reduce inside a
fori loop, marginal-timed. Suspect: this fixed per-query vector work
(~18 ops x Sp/8 vregs x rows), not cond overhead, is the dragon frame's
'estimator floor'."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpupathtrace_tpu.accel.kernel_traverse import (
    pair_slab_entries, _inv_dir, _B_VALID,
)

BLOCKS = 64


def make_kernel(n_iter, sp, rows):
    def kernel(sup_ref, x_ref, o_ref, scr_es):
        ox = x_ref[:rows] * 0.1
        oy = x_ref[:rows] * 0.2
        oz = x_ref[:rows] * 0.3
        ix = _inv_dir(x_ref[:rows] + 1.0)
        iy = _inv_dir(x_ref[:rows] + 2.0)
        iz = _inv_dir(x_ref[:rows] + 3.0)

        def body(i, acc):
            scr_es[:, :rows] = pair_slab_entries(
                sup_ref, rows, ox + acc * 1e-9, oy, oz, ix, iy, iz
            )
            bound = jnp.full((rows, 128), 1e30, jnp.float32)
            ent = jnp.where(scr_es[:, :rows] < bound[None], 1.0, 0.0)
            flag = jnp.max(jnp.max(ent, axis=1), axis=1, keepdims=True)
            return acc + jnp.max(flag)

        acc = jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))
        o_ref[:] = x_ref[:8] + acc
    return kernel


@functools.partial(jax.jit, static_argnames=("n_iter", "sp", "rows"))
def run(sup, x, n_iter, sp, rows):
    return pl.pallas_call(
        make_kernel(n_iter, sp, rows),
        grid=(BLOCKS,),
        in_specs=[
            pl.BlockSpec((sp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8 * BLOCKS, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sp, 16, 128), jnp.float32)],
    )(sup, x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(16 * BLOCKS, 128)).astype(np.float32))
for sp in [32, 128]:
    sup = np.zeros((sp, 128), np.float32)
    sup[:, 0:3] = rng.uniform(-1, 0, (sp, 3))
    sup[:, 3:6] = rng.uniform(0, 1, (sp, 3))
    sup[:, _B_VALID] = 1.0
    supj = jnp.asarray(sup)
    for rows in [8, 16]:
        ts = {}
        for n_iter in [32, 128]:
            np.asarray(run(supj, x, n_iter, sp, rows))
            t0 = time.time()
            for _ in range(3):
                np.asarray(run(supj, x, n_iter, sp, rows))
            ts[n_iter] = (time.time() - t0) / 3
        marg = (ts[128] - ts[32]) / (BLOCKS * (128 - 32)) * 1e6
        print(f"sup scan Sp={sp:4d} rows={rows:3d}: {marg:8.2f} us/query",
              flush=True)
