"""Isolate the sorted-wavefront driver's per-bounce glue cost: the
coherence-key argsort + 18-array gather, run B times over bench-size state,
with no kernel in the loop."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpupathtrace_tpu.integrator.sorted_wavefront import _sort_key

R = 262144
B = 20
rng = np.random.default_rng(0)
state = tuple(
    jnp.asarray(rng.normal(size=R).astype(np.float32)) for _ in range(17)
) + (jnp.asarray((rng.random(R) > 0.3).astype(np.float32)),)
lo = jnp.asarray(np.array([-1, -1, -1], np.float32))
hi = jnp.asarray(np.array([1, 1, 1], np.float32))

@jax.jit
def glue(state):
    def step(i, st):
        key = _sort_key(st[1], st[2], st[3], st[4], st[5], st[6],
                        st[17], lo, hi)
        perm = jnp.argsort(key, stable=False)
        return tuple(a[perm] for a in st)
    return jax.lax.fori_loop(0, B, step, state)

t0 = time.time(); out = glue(state); float(out[0][0]); print(f"# compile+run {time.time()-t0:.1f}s")
dt = 1e30
for _ in range(3):
    t0 = time.time(); out = glue(state); float(out[0][0]); dt = min(dt, time.time()-t0)
print(f"# glue x{B}: {dt*1000:.1f} ms total, {dt*1000/B:.2f} ms/bounce")
