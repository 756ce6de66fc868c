"""Batched vector math for the TPU path tracer.

All functions operate on arrays whose last axis is the vector axis (3 for
directions/positions, 4 for RGBA spectra), mirroring the semantics of the
reference's scalar vector library (reference: include/PathTrace/util/vector.h)
but as SoA/batched jnp ops so they vectorize onto the TPU VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis (ref: util/vector.h:192)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product (ref: util/vector.h:234)."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize over last axis. Division by a zero norm yields inf/nan like
    the reference's unchecked normalize (ref: util/vector.h)."""
    return v / length(v)[..., None]


def normalize_safely(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize, returning v unchanged when the norm underflows
    (ref: util/vector.h normalizeSafely)."""
    n2 = length_squared(v)
    safe = jnp.maximum(jnp.sqrt(n2), eps)
    return jnp.where(n2[..., None] > 0, v / safe[..., None], v)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction v (pointing toward the surface) about unit normal n
    (ref: util/vector.h:250)."""
    return v - n * (2.0 * dot(v, n))[..., None]


def orthonormal_frame(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build tangent/bitangent (b1, b2) so {b1, b2, n} is an orthonormal basis.

    Reproduces the branch structure of the reference's tangent-frame
    construction (ref: src/scene/propagation.cpp:24-62 impl::localToGlobal) as
    masked selects so every lane is branch-free:
      |nx|>0 & |ny|>0 -> d = (0, -nx, ny)
      |nx|>0 & ny==0  -> d = (0, -nx, nz)
      nx==0 & |ny|>0  -> d = (-ny, nz, 0)
      nx==0 & ny==0   -> d = (1, 0, 0)
    then b1 = normalize(cross(d, n)), b2 = normalize(cross(b1, n)).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    zero = jnp.zeros_like(nx)
    one = jnp.ones_like(nx)
    has_x = jnp.abs(nx) > 0.0
    has_y = jnp.abs(ny) > 0.0
    d = jnp.where(
        has_x[..., None],
        jnp.where(
            has_y[..., None],
            jnp.stack([zero, -nx, ny], axis=-1),
            jnp.stack([zero, -nx, nz], axis=-1),
        ),
        jnp.where(
            has_y[..., None],
            jnp.stack([-ny, nz, zero], axis=-1),
            jnp.stack([one, zero, zero], axis=-1),
        ),
    )
    d = normalize(d)
    b1 = normalize(cross(d, n))
    b2 = normalize(cross(b1, n))
    return b1, b2


def local_to_global(vec: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Transform a tangent-space vector (z = normal axis) to world space
    (ref: src/scene/propagation.cpp:24-62)."""
    b1, b2 = orthonormal_frame(n)
    return (
        b1 * vec[..., 0:1] + b2 * vec[..., 1:2] + n * vec[..., 2:3]
    )


def transform_points(mat4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 row-major affine matrix to [..., 3] points with perspective
    divide (ref: util/matrix.h:50-55 mat4::operator*(vec3))."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    h = jnp.concatenate([pts, ones], axis=-1)
    out = h @ mat4.T
    return out[..., :3] / out[..., 3:4]


# numpy (not jnp): module import must not force device-backend
# initialization; jnp ops accept numpy operands.
import numpy as _np

MAT3_IDENTITY = _np.eye(3, dtype=_np.float32)
MAT4_IDENTITY = _np.eye(4, dtype=_np.float32)


def mat3_vec(mat3: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Row-major 3x3 matrix times [..., 3] vectors
    (ref: util/matrix.h:41-47 mat3::operator*)."""
    return v @ mat3.T


def transform_directions(mat4: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the linear (rotation/scale) part of a 4x4 transform to
    direction vectors — no translation, no perspective divide."""
    return dirs @ mat4[:3, :3].T
