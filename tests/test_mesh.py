"""OBJ parser tests (ref: test/scene/mesh_test.cpp) + validation rules."""
import numpy as np

from cpupathtrace_tpu.scene.mesh import load_mesh
from cpupathtrace_tpu.scene.geometry import make_box, make_plane

QUAD_OBJ = """
# a unit quad as two triangles
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3
f 1 3 4
"""


def test_empty_inputs_yield_no_triangles():
    # (ref: mesh_test.cpp:12-22)
    assert load_mesh("") == []
    assert load_mesh("\n\n   \n") == []
    assert load_mesh("# comment only\n# another\n") == []


def test_quad_parses_to_two_triangles():
    tris = load_mesh(QUAD_OBJ)
    assert len(tris) == 2
    np.testing.assert_allclose(tris[0].a, [0, 0, 0])
    np.testing.assert_allclose(tris[0].b, [1, 0, 0])
    np.testing.assert_allclose(tris[0].c, [1, 1, 0])


def test_face_index_attributes_stripped():
    # `a/b/c` face tokens keep only the position index (ref: mesh.cpp:133-146).
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/2/3 2/1/1 3/9/9\n"
    tris = load_mesh(obj)
    assert len(tris) == 1


def test_out_of_range_face_rejected():
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 4\n"
    assert load_mesh(obj) == []


def test_duplicate_vertex_face_rejected():
    # (ref: mesh.cpp:164-169)
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 1 2\n"
    assert load_mesh(obj) == []


def test_collinear_face_rejected():
    # (ref: mesh.cpp:172-174)
    obj = "v 0 0 0\nv 1 0 0\nv 2 0 0\nf 1 2 3\n"
    assert load_mesh(obj) == []


def test_malformed_float_rejects_face():
    # Unparseable floats -> NaN verts -> incident faces rejected
    # (ref: mesh.cpp:96-121 tolerant parse).
    obj = "v x y z\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    assert load_mesh(obj) == []


def test_transform_applied_at_load():
    m = np.array(
        [[2.0, 0, 0, 1.0], [0, 2.0, 0, 0], [0, 0, 2.0, 0], [0, 0, 0, 1.0]]
    )
    tris = load_mesh(QUAD_OBJ, transformation=m)
    np.testing.assert_allclose(tris[0].b, [3.0, 0.0, 0.0])


def test_smooth_normals_averaged():
    # Two coplanar triangles: smooth == face normal everywhere.
    tris = load_mesh(QUAD_OBJ, smooth=True)
    for t in tris:
        np.testing.assert_allclose(t.na, [0, 0, 1], atol=1e-6)
    # A folded quad: shared-edge vertices get the average of both faces.
    folded = "v 0 0 0\nv 1 0 0\nv 1 1 1\nv 0 1 0\nf 1 2 3\nf 1 3 4\n"
    tris = load_mesh(folded, smooth=True)
    n0 = tris[0].face_normal()
    n0 = n0 / np.linalg.norm(n0)
    n1 = tris[1].face_normal()
    n1 = n1 / np.linalg.norm(n1)
    avg = n0 + n1
    avg = avg / np.linalg.norm(avg)
    # Vertex 1 (index 0) is shared by both faces.
    np.testing.assert_allclose(tris[0].na, avg, atol=1e-6)


def test_smooth_disabled_uses_face_normals():
    folded = "v 0 0 0\nv 1 0 0\nv 1 1 1\nv 0 1 0\nf 1 2 3\nf 1 3 4\n"
    tris = load_mesh(folded, smooth=False)
    n0 = tris[0].face_normal()
    n0 = n0 / np.linalg.norm(n0)
    np.testing.assert_allclose(tris[0].na, n0, atol=1e-6)


class TestProceduralGeometry:
    def test_make_plane_two_triangles(self):
        tris = make_plane((-1, 0, -1), (1, 0, 1))
        assert len(tris) == 2
        total = sum(t.surface_area() for t in tris)
        np.testing.assert_allclose(total, 4.0, rtol=1e-6)

    def test_make_plane_rejects_degenerate(self):
        # No shared axis -> invalid (ref: mesh.cpp:294-336).
        assert make_plane((0, 0, 0), (1, 1, 1)) == []
        # Two shared axes -> degenerate line.
        assert make_plane((0, 0, 0), (1, 0, 0)) == []

    def test_make_box_twelve_triangles(self):
        tris = make_box((-1, -1, -1), (1, 1, 1))
        assert len(tris) == 12
        total = sum(t.surface_area() for t in tris)
        np.testing.assert_allclose(total, 24.0, rtol=1e-6)

    def test_make_box_rejects_flat(self):
        assert make_box((0, 0, 0), (1, 1, 0)) == []


def test_out_of_range_numbers_rejected_tolerantly():
    """Huge int face indices overflow int64 (found by fuzzing) and huge
    float literals yield inf instead of the reference's stoi/stof
    out_of_range contract (-1 / NaN, rejecting the row); both must be
    tolerated, not crash, in all parser paths."""
    # Face index beyond int64: the row must be rejected, not raise.
    src = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 99999999999999999999999999 2 3\n"
    assert load_mesh(src) == []
    # Huge float literal: vertex becomes NaN -> its faces rejected.
    src2 = "v 1e99999 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    assert load_mesh(src2) == []
    # Same through the vectorized fast path (well-formed layout).
    src3 = ("v 1e400 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
            "f 1 2 3\nf 2 3 4\n")
    tris = load_mesh(src3)
    assert len(tris) == 1  # only the all-finite face survives


def test_mesh_from_arrays_matches_obj_text_path():
    """The arrays fast path (used by the benchmark stand-in) must match
    the OBJ-text round trip: same triangle count, f32-identical geometry
    and smooth normals (the arrays carry the text path's %.6f precision
    via standin_dragon_arrays' 6-decimal rounding)."""
    import numpy as np

    from cpupathtrace_tpu.models.scenes import (
        standin_dragon_arrays,
        standin_dragon_obj,
    )
    from cpupathtrace_tpu.scene.mesh import load_mesh, mesh_from_arrays

    tf = np.array(
        [[0.01, 0, 0, 0], [0, 0.01, 0, -0.5], [0, 0, 0.01, 0], [0, 0, 0, 1.0]]
    )
    via_text = load_mesh(
        standin_dragon_obj(20000), tf, cull_backface=False, smooth=True,
        as_batch=True,
    )
    verts, faces = standin_dragon_arrays(20000)
    via_arrays = mesh_from_arrays(
        verts, faces, tf, cull_backface=False, smooth=True, as_batch=True
    )
    assert len(via_text) == len(via_arrays)
    for f in ("v0", "v1", "v2", "n0", "n1", "n2"):
        a = np.asarray(getattr(via_text, f), np.float32)
        b = np.asarray(getattr(via_arrays, f), np.float32)
        # %.6f text -> float64 parse and np.round(x, 6) can differ by an
        # f64 ulp at decimal-rounding boundaries; in f32 that vanishes.
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_mesh_from_arrays_validates_faces():
    import numpy as np

    from cpupathtrace_tpu.scene.mesh import mesh_from_arrays

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 0, 0]], float)
    faces = np.array([
        [0, 1, 2],   # valid
        [0, 1, 1],   # duplicate vertex
        [0, 1, 3],   # collinear
        [0, 1, 9],   # out of range
    ])
    batch = mesh_from_arrays(verts, faces, as_batch=True)
    assert len(batch) == 1
