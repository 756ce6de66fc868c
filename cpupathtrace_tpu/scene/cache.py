"""Scene table persistence: save/load built `SceneData` to a single
`.npz` file, plus a keyed build cache.

The reference loads its scene from OBJ and rebuilds the BVH on every
process start (ref: src/scene/scene.cpp:153-181 runs in the `Scene`
ctor; at the 7.2M-triangle benchmark mesh that is ~72 s of load+build,
BASELINE.md). This module is the production-ingest answer for the TPU
framework: build once, persist the packed SoA tables (including the
multi-gigabyte in-kernel pair records), and reload at disk speed.

Format: one uncompressed `.npz` holding every array field of `SceneData`
plus a `__meta__` JSON blob for the static fields. Uncompressed on
purpose — the pair-record table is ~0.5 GB/M-triangles and dominated by
float entropy; zlib costs minutes and saves little.

`cached_build(key, build_fn, cache_dir)` wraps any scene-producing
callable with a content-keyed cache. The key must capture everything the
build depends on (mesh identity, accel knobs, PTX_* env overrides);
`build_cache_key` helps assemble one.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import numpy as np

from .scene import SceneData

# Bump when the SceneData field set / packed-table layout changes in a
# way that invalidates cached files.
_FORMAT_VERSION = 1


def _split_fields():
    arrays, meta = [], []
    for f in dataclasses.fields(SceneData):
        # Mirrors the register_dataclass split: static config fields are
        # plain python scalars/strings, everything else is an array leaf.
        if f.name in (
            "n_tri", "n_sph", "n_point_lights", "n_emissive",
            "emissive_sample_count", "accel", "bvh_depth", "cl_depth",
            "cluster_size", "emissive_all_tri", "n_big",
            "krn_cluster_size", "emissive_in_dense", "gp_axis",
            "krn_cull_mode", "krn_big_cull_mode", "lean",
        ):
            meta.append(f.name)
        else:
            arrays.append(f.name)
    return tuple(arrays), tuple(meta)


_ARRAYS, _META = _split_fields()


def save_scene(scene: SceneData, path: str | os.PathLike) -> None:
    """Persist a built scene's tables to `path` (.npz, uncompressed)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {name: np.asarray(getattr(scene, name)) for name in _ARRAYS}
    meta = {name: getattr(scene, name) for name in _META}
    meta["__format__"] = _FORMAT_VERSION
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic vs concurrent readers


def load_scene(path: str | os.PathLike) -> SceneData:
    """Reload a scene saved by `save_scene`; arrays land on the default
    device. Raises ValueError on a format-version mismatch."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.pop("__format__", None) != _FORMAT_VERSION:
            raise ValueError(
                f"{path}: stale scene-cache format "
                f"(want {_FORMAT_VERSION}); rebuild"
            )
        kwargs = {name: jnp.asarray(z[name]) for name in _ARRAYS}
    kwargs.update(meta)
    return SceneData(**kwargs)


def build_cache_key(*parts, env_knobs: bool = True) -> str:
    """Hash arbitrary printable parts (mesh path + mtime, tri counts,
    accel options...) plus — by default — every PTX_* env var that can
    change packed-table layout, into a hex cache key."""
    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION}".encode())
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    if env_knobs:
        for k in sorted(os.environ):
            if k.startswith("PTX_KRN_") or k == "PTX_KRN_MAX_TRIS":
                h.update(f"{k}={os.environ[k]}".encode())
    return h.hexdigest()[:24]


def cached_build(
    key: str,
    build_fn: Callable[[], SceneData],
    cache_dir: str | os.PathLike,
) -> tuple[SceneData, bool]:
    """Return (scene, was_cache_hit). On a miss, runs `build_fn`, saves
    the result under `cache_dir/<key>.npz`, and returns it. A corrupt or
    stale-format file is treated as a miss and overwritten."""
    path = Path(cache_dir) / f"{key}.npz"
    if path.exists():
        try:
            return load_scene(path), True
        except Exception:  # corrupt/stale -> rebuild
            pass
    scene = build_fn()
    save_scene(scene, path)
    return scene, False
