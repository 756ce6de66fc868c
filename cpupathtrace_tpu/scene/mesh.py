"""Wavefront OBJ mesh loading (host-side).

Behavioral parity with the reference's hand-rolled parser
(ref: src/scene/mesh.cpp:11-271 impl::ObjParser):
  * only `v` and `f` records are honored; everything else is skipped
  * face vertex references keep only the position index (`a/b/c` -> `a`,
    ref: mesh.cpp:133-146)
  * unparseable floats become NaN and unparseable ints -1, which then reject
    the affected face (ref: mesh.cpp:96-121)
  * face validation: index bounds, pairwise-distinct vertices,
    non-collinearity via squared face-normal length (ref: mesh.cpp:149-174)
  * the load-time 4x4 transform applies to vertices as they are read
    (ref: mesh.cpp:127)
  * optional smoothing: per-vertex average of *normalized* face normals,
    written back to each incident triangle's vertex normal
    (ref: mesh.cpp:228-267)

A vectorized NumPy fast path handles large well-formed meshes; a tolerant
per-line fallback reproduces the reference's forgiving behavior for malformed
input. (A C++ parser for very large assets lives in cpupathtrace_tpu/native.)
"""
from __future__ import annotations

import io as _io

import numpy as np

from .geometry import HostTriangle, TriangleBatch

_IDENTITY = np.eye(4, dtype=np.float64)

#: OBJ text size above which load_mesh uses the native C++ parser.
NATIVE_PARSE_MIN_BYTES = 1 << 20


def _parse_float(tok: str) -> float:
    # Mirror the reference's tolerant char filter + stof (ref: mesh.cpp:96-121):
    # keep leading [0-9.eE+-] chars, NaN when nothing parses.
    buf = []
    for ch in tok:
        if ch.isdigit() or ch in ".-+eE":
            buf.append(ch)
        else:
            break
    try:
        v = float("".join(buf))
    except ValueError:
        return float("nan")
    # std::stof throws out_of_range on huge literals (e.g. 1e999), which the
    # reference's tolerant parse turns into NaN (ref: mesh.cpp:96-121).
    if v in (float("inf"), float("-inf")):
        return float("nan")
    return v


def _parse_int(tok: str) -> int:
    tok = tok.split("/", 1)[0]
    buf = []
    for ch in tok:
        if ch.isdigit() or ch in "-+eE":
            buf.append(ch)
        else:
            break
    try:
        v = int("".join(buf))
    except ValueError:
        return -1
    # std::stoi throws out_of_range beyond int range, which the reference's
    # tolerant parse turns into -1; Python ints are unbounded and would
    # overflow the int64 face array instead (found by fuzzing).
    if not -(2 ** 31) <= v < 2 ** 31:
        return -1
    return v


def _parse_tolerant(lines):
    vertices: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    for line in lines:
        stripped = line.lstrip(" ")
        if stripped.startswith("v "):
            toks = stripped[2:].split()
            vals = [_parse_float(t) for t in toks[:3]]
            while len(vals) < 3:
                vals.append(float("nan"))
            vertices.append((vals[0], vals[1], vals[2]))
        elif stripped.startswith("f "):
            toks = stripped[2:].split()
            idx = [_parse_int(t) - 1 for t in toks[:3]]
            while len(idx) < 3:
                idx.append(-1)
            faces.append((idx[0], idx[1], idx[2]))
    return (
        np.asarray(vertices, np.float64).reshape(-1, 3),
        np.asarray(faces, np.int64).reshape(-1, 3),
    )


def _parse_fast(lines):
    """Vectorized parse for well-formed files; returns None if anything looks
    irregular (caller falls back to the tolerant path)."""
    v_lines = [l for l in lines if l.startswith("v ")]
    f_lines = [l for l in lines if l.startswith("f ")]
    try:
        v_tok = " ".join(l[2:] for l in v_lines).split()
        v = np.array(v_tok, dtype=np.float64)
        if v.size != 3 * len(v_lines):
            return None
        f_tok = [
            t.split("/", 1)[0] for l in f_lines for t in l[2:].split()
        ]
        f = np.array(f_tok, dtype=np.int64)
        if f.size != 3 * len(f_lines):
            return None
        return v.reshape(-1, 3), (f.reshape(-1, 3) - 1)
    except Exception:
        return None


def load_mesh(
    source,
    transformation: np.ndarray | None = None,
    cull_backface: bool = True,
    smooth: bool = True,
    as_batch: bool = False,
) -> list[HostTriangle] | TriangleBatch:
    """Load triangles from a path, file object, or OBJ text
    (ref API: io::loadMesh, include/PathTrace/scene/mesh.h:23-51).

    `as_batch=True` returns a columnar `TriangleBatch` instead of a list of
    `HostTriangle`s — the same triangles, without the per-object Python cost
    (~20s for a million triangles)."""
    if hasattr(source, "read"):
        text = source.read()
    else:
        source = str(source)
        if "\n" in source or source.strip() == "" or source.lstrip().startswith(("v ", "f ", "#")):
            text = source
        else:
            try:
                with open(source, "r", errors="replace") as fh:
                    text = fh.read()
            except OSError:
                # Not a readable path: treat as (garbage) OBJ text — the
                # tolerant parser contract never raises, matching the
                # reference, whose path overload reads a failed ifstream as
                # empty (ref: mesh.cpp:286; unknown records are ignored).
                # Warn so a typo'd mesh path doesn't silently render an
                # empty scene.
                import warnings

                warnings.warn(
                    f"load_mesh: {source!r} is not a readable path; "
                    "parsing it as OBJ text",
                    stacklevel=2,
                )
                text = source
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")

    parsed = None
    # Large inputs: the native C++ parser (native/ptx_native.cpp) with the
    # same tolerant v/f semantics, ~20x faster than Python line handling.
    # (Module constant so the fuzz harness can force the native path and
    # cross-check it against the Python parse on arbitrary inputs.)
    if len(text) > NATIVE_PARSE_MIN_BYTES:
        from ..native import parse_obj_native

        native = parse_obj_native(text)
        if native is not None:
            verts64, faces64 = native
            parsed = (np.asarray(verts64, np.float64), faces64)
    if parsed is None:
        # The reference eats leading spaces before the record tag
        # (mesh.cpp:186) — only materialized when Python line parsing runs.
        lines = [l.lstrip(" ") for l in text.splitlines()]
        parsed = _parse_fast(lines)
        if parsed is None:
            parsed = _parse_tolerant(lines)
    verts, face_idx = parsed
    # Normalize across parsers: out-of-range float literals are NaN (the
    # reference's stof out_of_range contract); the vectorized/native paths
    # would otherwise yield inf, which face validation cannot reject.
    verts = np.where(np.isfinite(verts), verts, np.nan)
    return mesh_from_arrays(
        verts, face_idx, transformation,
        cull_backface=cull_backface, smooth=smooth, as_batch=as_batch,
    )


def mesh_from_arrays(
    verts: np.ndarray,
    face_idx: np.ndarray,
    transformation: np.ndarray | None = None,
    cull_backface: bool = True,
    smooth: bool = True,
    as_batch: bool = False,
) -> list[HostTriangle] | TriangleBatch:
    """Build triangles from raw vertex [V,3] + face-index [F,3] arrays —
    the exact post-parse pipeline of `load_mesh` (transform at load,
    face validation, smooth vertex normals; ref: mesh.cpp:127-267),
    without the OBJ text round trip. The procedural benchmark meshes use
    this: generating + parsing 7M faces of OBJ text costs ~60 s that is
    pure serialization overhead when the geometry is already in memory."""
    verts = np.asarray(verts, np.float64).reshape(-1, 3)
    face_idx = np.asarray(face_idx, np.int64).reshape(-1, 3)
    mat = _IDENTITY if transformation is None else np.asarray(transformation, np.float64)
    if verts.shape[0]:
        h = np.concatenate([verts, np.ones((verts.shape[0], 1))], axis=1) @ mat.T
        verts = h[:, :3] / h[:, 3:4]

    n_v = verts.shape[0]
    if face_idx.shape[0] == 0 or n_v == 0:
        # Faces without any vertices are all out of range
        # (ref: mesh.cpp:149-158 index validation).
        return TriangleBatch.empty() if as_batch else []

    # Threaded native fast path for large meshes — bit-identical to the
    # numpy pipeline below (the C++ mirrors its float-op order exactly;
    # see native/src/ptx_native.cpp ptx_mesh_pipeline).
    if as_batch and face_idx.shape[0] >= 65536:
        from ..native import mesh_pipeline_native

        res = mesh_pipeline_native(verts, face_idx, smooth)
        if res is not None:
            a, b, c, na, nb, nc = res
            n = a.shape[0]
            return TriangleBatch(
                v0=a, v1=b, v2=c, n0=na, n1=nb, n2=nc,
                cull=np.full(n, cull_backface, bool),
                material=np.full(n, -1, np.int32),
            )

    # Face validation (ref: mesh.cpp:149-174).
    in_range = np.all((face_idx >= 0) & (face_idx < n_v), axis=1)
    face_idx_c = np.clip(face_idx, 0, max(n_v - 1, 0))
    a = verts[face_idx_c[:, 0]]
    b = verts[face_idx_c[:, 1]]
    c = verts[face_idx_c[:, 2]]
    ab2 = np.sum((b - a) ** 2, axis=1)
    ac2 = np.sum((c - a) ** 2, axis=1)
    bc2 = np.sum((c - b) ** 2, axis=1)
    distinct = (ab2 > 0) & (ac2 > 0) & (bc2 > 0)  # NaN-rejecting comparisons
    fn = np.cross(b - a, c - a)
    non_collinear = np.sum(fn * fn, axis=1) > 0
    keep = in_range & distinct & non_collinear

    face_idx = face_idx_c[keep]
    a, b, c, fn = a[keep], b[keep], c[keep], fn[keep]

    # Face normals, normalized.
    fn_len = np.linalg.norm(fn, axis=1, keepdims=True)
    fn_unit = fn / np.maximum(fn_len, 1e-300)

    if smooth and face_idx.shape[0]:
        # Per-vertex average of normalized incident face normals
        # (ref: mesh.cpp:228-267).
        v_norm = np.zeros((n_v, 3))
        for k in range(3):
            np.add.at(v_norm, face_idx[:, k], fn_unit)
        v_len2 = np.sum(v_norm * v_norm, axis=1)
        ok = v_len2 > 0
        v_unit = np.where(
            ok[:, None], v_norm / np.sqrt(np.maximum(v_len2, 1e-300))[:, None], 0.0
        )
        na = np.where(ok[face_idx[:, 0], None], v_unit[face_idx[:, 0]], fn_unit)
        nb = np.where(ok[face_idx[:, 1], None], v_unit[face_idx[:, 1]], fn_unit)
        nc = np.where(ok[face_idx[:, 2], None], v_unit[face_idx[:, 2]], fn_unit)
    else:
        na = nb = nc = fn_unit

    if as_batch:
        n = face_idx.shape[0]
        return TriangleBatch(
            v0=a, v1=b, v2=c,
            n0=np.ascontiguousarray(na), n1=np.ascontiguousarray(nb),
            n2=np.ascontiguousarray(nc),
            cull=np.full(n, cull_backface, bool),
            material=np.full(n, -1, np.int32),
        )
    return [
        HostTriangle(
            a[i], b[i], c[i], cull_backface,
            na=na[i].copy(), nb=nb[i].copy(), nc=nc[i].copy(),
        )
        for i in range(face_idx.shape[0])
    ]
