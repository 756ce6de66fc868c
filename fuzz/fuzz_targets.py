"""Fuzz harness for the host-side parsers — the analog of the reference's
libFuzzer targets (ref: fuzz/target_image_io_read.cpp, fuzz/
target_mesh_parser.cpp): random/mutated byte inputs must never raise
unexpected exceptions or corrupt state.

Run standalone:  python fuzz/fuzz_targets.py [iterations] [seed]
Also exercised by tests/test_fuzz.py with a fixed budget.
"""
from __future__ import annotations

import io
import os
import sys

import numpy as np

# Running as `python fuzz/fuzz_targets.py` puts fuzz/ (not the repo root)
# on sys.path; make the package importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


INTERESTING_TOKENS = [
    b"v ", b"f ", b"vn ", b"vt ", b"#", b"\n", b" ", b"/", b"-", b"+",
    b"1", b"0.5", b"1e30", b"1e-300", b"nan", b"inf", b"-1", b"999999999999",
    b"v 0 0 0\n", b"f 1 2 3\n", b"f 1/2/3 4//5 6/\n",
]


def mutate_obj(rng: np.random.Generator) -> bytes:
    """Generate OBJ-ish input: token soup + random bytes (the libFuzzer
    dictionary-style strategy, ref fuzz mesh target uses raw bytes)."""
    n = int(rng.integers(0, 64))
    parts = []
    for _ in range(n):
        if rng.random() < 0.7:
            parts.append(INTERESTING_TOKENS[int(rng.integers(0, len(INTERESTING_TOKENS)))])
        else:
            parts.append(bytes(rng.integers(0, 256, size=int(rng.integers(1, 8)), dtype=np.uint8)))
    return b"".join(parts)


def fuzz_mesh_once(rng: np.random.Generator) -> None:
    # First 2 random bits drive cull/smooth flags, like the reference's
    # fuzzer using the first 2 input bytes (fuzz/target_mesh_parser.cpp:12-20).
    from cpupathtrace_tpu.scene.mesh import load_mesh

    cull = bool(rng.integers(0, 2))
    smooth = bool(rng.integers(0, 2))
    data = mutate_obj(rng)
    # Stream entry point, like the reference fuzzer's istream target
    # (a bare string would be interpreted as a filesystem path).
    tris = load_mesh(
        io.StringIO(data.decode("utf-8", errors="replace")), None, cull, smooth
    )
    # Invariants: a list of well-formed triangles with finite data.
    for t in tris[:16]:
        assert np.isfinite(t.a).all() and np.isfinite(t.na).all()


def fuzz_native_parser_once(rng: np.random.Generator) -> None:
    """Native OBJ parser parity: the C++ tolerant parser
    (native/ptx_native.cpp ptx_parse_obj) must produce the SAME triangles
    as the Python line parser on arbitrary garbage — this both checks the
    semantics and memory-safety-fuzzes the C code (an out-of-bounds write
    crashes the process)."""
    import cpupathtrace_tpu.scene.mesh as mesh_mod
    from cpupathtrace_tpu.native import get_lib
    from cpupathtrace_tpu.scene.mesh import load_mesh

    if get_lib() is None:
        return
    cull = bool(rng.integers(0, 2))
    smooth = bool(rng.integers(0, 2))
    data = mutate_obj(rng).decode("utf-8", errors="replace")
    orig = mesh_mod.NATIVE_PARSE_MIN_BYTES
    try:
        mesh_mod.NATIVE_PARSE_MIN_BYTES = 0  # force the native parser
        t_native = load_mesh(io.StringIO(data), None, cull, smooth)
    finally:
        mesh_mod.NATIVE_PARSE_MIN_BYTES = orig
    t_py = load_mesh(io.StringIO(data), None, cull, smooth)
    assert len(t_native) == len(t_py), (len(t_native), len(t_py), data[:200])
    for a, b in zip(t_native[:16], t_py[:16]):
        assert np.array_equal(a.a, b.a) and np.array_equal(a.b, b.b)
        assert np.array_equal(
            np.nan_to_num(a.na, nan=-7.0), np.nan_to_num(b.na, nan=-7.0)
        )


def fuzz_png_once(rng: np.random.Generator) -> None:
    """PNG reader: random bytes and truncated/mutated valid PNGs must raise
    only controlled errors (ref: fuzz/target_image_io_read.cpp)."""
    from cpupathtrace_tpu.utils.image_io import read_rgb_image, write_rgb_image

    choice = rng.random()
    buf = io.BytesIO()
    if choice < 0.4:
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(0, 256)), dtype=np.uint8))
    else:
        img = rng.random((4, 4, 4)).astype(np.float32)
        tmp = io.BytesIO()
        write_rgb_image(tmp, img)
        payload = bytearray(tmp.getvalue())
        if choice < 0.8 and len(payload) > 8:
            # mutate a few bytes / truncate
            for _ in range(int(rng.integers(1, 6))):
                payload[int(rng.integers(0, len(payload)))] = int(rng.integers(0, 256))
            if rng.random() < 0.5:
                payload = payload[: int(rng.integers(8, len(payload)))]
        payload = bytes(payload)
    buf = io.BytesIO(payload)
    try:
        out = read_rgb_image(buf)
        assert out.ndim == 3 and out.shape[-1] == 4
    except Exception as e:  # controlled decode errors only
        if not isinstance(e, (OSError, ValueError, SyntaxError)):
            raise


def run(iterations: int = 2000, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    for i in range(iterations):
        fuzz_mesh_once(rng)
        fuzz_native_parser_once(rng)
        fuzz_png_once(rng)
        if i and i % 500 == 0:
            print(f"{i} iterations ok", file=sys.stderr)


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    run(iters, seed)
    print(f"fuzz ok: {iters} iterations")
