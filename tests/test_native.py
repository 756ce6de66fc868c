"""Native C++ component tests: the ctypes BVH builder and OBJ parser must
agree with the pure-Python implementations (same tree, same mesh)."""
import numpy as np
import pytest

from cpupathtrace_tpu.accel.build import build_bvh
from cpupathtrace_tpu.native import build_bvh_native, get_lib, parse_obj_native
from cpupathtrace_tpu.scene.mesh import load_mesh

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no compiler)"
)


def _random_bounds(n, seed=0):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 2.0, size=(n, 3)).astype(np.float32)
    return lo, hi


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 1000])
def test_native_bvh_matches_python_exactly(n):
    lo, hi = _random_bounds(n, seed=n)
    py = build_bvh(lo, hi, use_native=False)
    nat = build_bvh(lo, hi, use_native=True)
    np.testing.assert_array_equal(py.prim, nat.prim)
    np.testing.assert_array_equal(py.left, nat.left)
    np.testing.assert_array_equal(py.right, nat.right)
    np.testing.assert_allclose(py.lo, nat.lo)
    np.testing.assert_allclose(py.hi, nat.hi)
    assert py.depth == nat.depth


def test_native_bvh_degenerate_identical_boxes():
    lo = np.zeros((16, 3), np.float32)
    hi = np.ones((16, 3), np.float32)
    py = build_bvh(lo, hi, use_native=False)
    nat = build_bvh(lo, hi, use_native=True)
    np.testing.assert_array_equal(py.prim, nat.prim)
    assert py.depth == nat.depth
    # All 16 leaves present exactly once.
    leaves = sorted(p for p in nat.prim if p >= 0)
    assert leaves == list(range(16))


def test_native_obj_parser_matches_python():
    obj = (
        "# comment\n"
        "v 0 0 0\n"
        "v 1 0 0\n"
        "v 1 1 0\n"
        "v 0 1 0\n"
        "vn 0 0 1\n"
        "vt 0.5 0.5\n"
        "f 1/1/1 2/2/1 3/3/1\n"
        "f 1 3 4\n"
    )
    verts, faces = parse_obj_native(obj)
    np.testing.assert_allclose(
        verts, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    )
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_native_obj_parser_tolerant():
    verts, faces = parse_obj_native("v x y z\nf 1 2\n")
    assert verts.shape == (1, 3)
    assert np.isnan(verts).all()
    # Short face: missing indices become -1 (then rejected downstream).
    assert faces.shape == (1, 3)
    assert faces[0, 2] == -1


def test_load_mesh_large_uses_native_same_result():
    # Build a >1MB OBJ so load_mesh takes the native path; parse it both
    # ways and compare the resulting triangles.
    import io

    n = 60
    rows = []
    for i in range(n):
        for j in range(n):
            rows.append(f"v {i*0.1:.6f} {j*0.1:.6f} {((i*j) % 7)*0.05:.6f}")
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j + 1
            rows.append(f"f {a} {a+1} {a+n}")
            rows.append(f"f {a+1} {a+n+1} {a+n}")
    text = "\n".join(rows) + "\n"
    # Pad with comments to cross the native threshold.
    text += "# pad\n" * (((1 << 20) - len(text)) // 6 + 2)
    assert len(text) > 1 << 20

    tris_big = load_mesh(text, smooth=True)
    small = "\n".join(rows) + "\n"
    tris_small = load_mesh(small, smooth=True)
    assert len(tris_big) == len(tris_small) == 2 * (n - 1) * (n - 1)
    for a, b in zip(tris_big[:50], tris_small[:50]):
        np.testing.assert_allclose(a.a, b.a, atol=1e-6)
        np.testing.assert_allclose(a.na, b.na, atol=1e-6)
