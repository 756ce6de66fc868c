"""Do constant-index SMEM/VMEM table inputs cost per grid step?
Same empty-ish kernel at 256 blocks, with 0 or 6 SMEM table inputs plus a
VMEM [128,128] table (mirroring the megakernel's input set)."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS, LANES, BLOCKS = 8, 128, 256

def make_kernel(n_tbl, vmem_tbl):
    def kernel(*refs):
        i = 0
        acc = None
        for k in range(n_tbl):
            v = refs[k][0, 0]
            acc = v if acc is None else acc + v
        i = n_tbl
        if vmem_tbl:
            tv = refs[i][0, 0]
            acc = tv if acc is None else acc + tv
            i += 1
        x = refs[i][:]
        o = refs[i + 1]
        o[:] = x + (0.0 if acc is None else acc * 1e-9)
    return kernel

@functools.partial(jax.jit, static_argnames=("n_tbl", "vmem_tbl"))
def run(tbls, vt, x, n_tbl, vmem_tbl):
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [smem(t.shape) for t in tbls[:n_tbl]]
    args = list(tbls[:n_tbl])
    if vmem_tbl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(vt)
    in_specs.append(pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM))
    args.append(x)
    return pl.pallas_call(
        make_kernel(n_tbl, vmem_tbl),
        grid=(BLOCKS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS * BLOCKS, LANES), jnp.float32),
    )(*args)

x = jnp.ones((ROWS * BLOCKS, LANES), jnp.float32)
tbls = [jnp.ones(s, jnp.float32) for s in [(14, 24), (1, 8), (4, 12), (1, 8), (2, 24), (1, 1)]]
vt = jnp.ones((128, 128), jnp.float32)

def timeit(fn):
    np.asarray(fn()); best = 1e30
    for _ in range(5):
        t0 = time.time(); np.asarray(fn()); best = min(best, time.time() - t0)
    return best * 1000

t0 = timeit(lambda: run(tbls, vt, x, 0, False))
t6 = timeit(lambda: run(tbls, vt, x, 6, False))
t6v = timeit(lambda: run(tbls, vt, x, 6, True))
print(f"256 blocks: no tables {t0:.2f} ms | 6 SMEM tables {t6:.2f} | +VMEM[128,128] {t6v:.2f}",
      flush=True)
