"""Does Mosaic lax.cond cost scale with the surrounding LIVE STATE?
Carries N [8,128] f32 arrays through a fori loop whose body runs K conds;
only one array flows through each cond, the rest stay live across it."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS, LANES, BLOCKS = 8, 128, 64

def make_kernel(n_iter, n_live, k_conds, use_cond):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        live = tuple(x * (1.0 + 0.001 * i) for i in range(n_live))
        def body(i, st):
            live = st
            y = live[0]
            for k in range(k_conds):
                def taken(y):
                    return y * 1.000001 + 0.000001
                if use_cond:
                    y = jax.lax.cond(jnp.max(y) > -1.0, taken, lambda v: v, y)
                else:
                    y = taken(y)
            # keep everything live: fold y into each array cheaply
            return tuple(a + y * 1e-12 for a in live)
        live = jax.lax.fori_loop(0, n_iter, body, live)
        acc = live[0]
        for a in live[1:]:
            acc = acc + a * 1e-6
        o_ref[:] = acc
    return kernel

@functools.partial(jax.jit, static_argnames=("n_iter", "n_live", "k_conds", "use_cond"))
def run(x, n_iter, n_live, k_conds, use_cond):
    return pl.pallas_call(
        make_kernel(n_iter, n_live, k_conds, use_cond),
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS * BLOCKS, LANES), jnp.float32),
    )(x)

x = jnp.ones((ROWS * BLOCKS, LANES), jnp.float32) * 0.5
for n_live in [2, 19]:
    for use_cond in [True, False]:
        ts = {}
        for n_iter in [256, 1024]:
            np.asarray(run(x, n_iter, n_live, 8, use_cond))
            t0 = time.time()
            for _ in range(3):
                np.asarray(run(x, n_iter, n_live, 8, use_cond))
            ts[n_iter] = (time.time() - t0) / 3
        marg = (ts[1024] - ts[256]) / (BLOCKS * (1024 - 256)) * 1e9
        print(f"live={n_live:3d} cond={use_cond}: marginal {marg:9.1f} ns/iter "
              f"(8 conds per iter)", flush=True)
