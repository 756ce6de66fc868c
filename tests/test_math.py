"""Vector-math unit tests (ref analog: util/vector.h semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cpupathtrace_tpu.utils.math import (
    cross,
    dot,
    length,
    local_to_global,
    normalize,
    normalize_safely,
    orthonormal_frame,
    reflect,
    transform_points,
)


def test_dot_cross_basic():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, -5.0, 6.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(dot(a, b), [12.0, 0.0])
    np.testing.assert_allclose(cross(a, b)[1], [1.0, 0.0, 0.0])
    # anti-commutativity and orthogonality
    c = cross(a, b)
    np.testing.assert_allclose(c, -cross(b, a))
    np.testing.assert_allclose(dot(c, a), 0.0, atol=1e-5)
    np.testing.assert_allclose(dot(c, b), 0.0, atol=1e-5)


def test_normalize():
    v = jnp.array([3.0, 0.0, 4.0])
    np.testing.assert_allclose(length(normalize(v)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(normalize(v), [0.6, 0.0, 0.8], rtol=1e-6)


def test_normalize_safely_zero_vector():
    v = jnp.zeros(3)
    out = normalize_safely(v)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(out, 0.0)


def test_reflect():
    # Incoming ray pointing down onto y-up plane reflects up.
    v = normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    r = reflect(v, n)
    np.testing.assert_allclose(r, normalize(jnp.array([1.0, 1.0, 0.0])), atol=1e-6)
    # Reflection preserves length.
    np.testing.assert_allclose(length(r), 1.0, rtol=1e-6)


@pytest.mark.parametrize(
    "n",
    [
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.577350269, 0.577350269, 0.577350269],
        [0.0, -0.707106781, 0.707106781],
    ],
)
def test_orthonormal_frame(n):
    n = jnp.array(n)
    b1, b2 = orthonormal_frame(n)
    for v in (b1, b2):
        np.testing.assert_allclose(length(v), 1.0, rtol=1e-5)
    np.testing.assert_allclose(dot(b1, b2), 0.0, atol=1e-6)
    np.testing.assert_allclose(dot(b1, n), 0.0, atol=1e-6)
    np.testing.assert_allclose(dot(b2, n), 0.0, atol=1e-6)


def test_local_to_global_z_maps_to_normal():
    n = normalize(jnp.array([1.0, 2.0, -0.5]))
    out = local_to_global(jnp.array([0.0, 0.0, 1.0]), n)
    np.testing.assert_allclose(out, n, atol=1e-6)


def test_transform_points_affine_and_perspective():
    # Affine: scale + translate (row-major, ref: util/matrix.h:50-55).
    m = jnp.array(
        [
            [2.0, 0.0, 0.0, 1.0],
            [0.0, 3.0, 0.0, -1.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    p = jnp.array([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(transform_points(m, p), [[3.0, 2.0, 1.0]], atol=1e-6)
    # Perspective divide by w.
    m2 = m.at[3, 3].set(2.0)
    np.testing.assert_allclose(transform_points(m2, p), [[1.5, 1.0, 0.5]], atol=1e-6)
