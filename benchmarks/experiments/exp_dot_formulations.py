"""De-risk: Mosaic in-kernel dot_general shapes for the pairwise record test.

Tests, inside one pallas kernel on hardware:
  1. C = dot(B [16,512], A [16,128]) contracting dim0/dim0 -> [512,128]
  2. per-j loop of 8 such matmuls (batch via unrolled loop)
  3. reduction over middle axis of [8,128,128] -> [8,128]
  4. extraction matmul dot(E [16,128t], onehot [128t,128r]) -> [16,128]
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def kernel(b_ref, a_ref, e_ref, c_out, r_out, x_out):
    B = b_ref[:]          # [16, 512]
    E = e_ref[:]          # [16, 128]
    cs = []
    for j in range(8):
        A_j = a_ref[j]    # [16, 128]
        C_j = jax.lax.dot_general(
            B, A_j, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                  # [512, 128]
        cs.append(C_j)
    C = jnp.stack(cs)      # [8, 512, 128]
    c_out[:] = C
    # middle-axis reduce of a quantity slice
    q = C[:, 0:128, :]     # [8, 128, 128]
    r_out[:] = jnp.min(q, axis=1)
    # one-hot extraction matmul per j
    tmin = jnp.min(q, axis=1)                      # [8,128]
    onehot = (q == tmin[:, None, :]).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 1).astype(
        jnp.float32
    )
    first = jnp.min(jnp.where(onehot > 0, iota, 128.0), axis=1)
    onehot = onehot * (iota == first[:, None, :]).astype(jnp.float32)
    outs = []
    for j in range(8):
        X_j = jax.lax.dot_general(
            E, onehot[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                  # [16, 128]
        outs.append(X_j)
    x_out[:] = jnp.stack(outs)


@jax.jit
def run(B, A, E):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 512, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
        ],
    )(B, A, E)


rng = np.random.default_rng(0)
B = rng.normal(size=(16, 512)).astype(np.float32)
A = rng.normal(size=(8, 16, 128)).astype(np.float32)
E = rng.normal(size=(16, 128)).astype(np.float32)

t0 = time.time()
C, R, X = map(np.asarray, run(B, A, E))
print(f"# compile+run {time.time()-t0:.1f}s")

C_ref = np.einsum("fq,jfr->jqr", B, A)
err = np.abs(C - C_ref).max() / np.abs(C_ref).max()
print(f"# matmul rel err {err:.2e}")
q = C_ref[:, 0:128, :]
R_ref = q.min(axis=1)
print(f"# reduce err {np.abs(R - R_ref).max():.2e}")
# extraction reference
tmin = q.min(axis=1)
oh = (q == tmin[:, None, :])
iota = np.arange(128)[None, :, None]
first = np.where(oh, iota, 128).min(axis=1)
oh = oh & (iota == first[:, None, :])
X_ref = np.einsum("ft,jtr->jfr", E, oh.astype(np.float32))
print(f"# extract err {np.abs(X - X_ref).max():.2e}")
print("# OK")
