"""TPU-platform lowering smoke tests, runnable without a TPU.

`jax.export(platforms=["tpu"])` runs the full StableHLO lowering —
including the Pallas-to-Mosaic kernel lowering — on any host, so trace-
and lowering-level regressions in the megakernel family are caught in CI
even when the interpret-mode tests (which bypass Mosaic lowering) pass.
Mosaic *compile*-time legalization still needs real hardware
(`bench.py --verify`)."""
import jax
import jax.numpy as jnp
import pytest
from jax import export

from cpupathtrace_tpu.core.config import RenderOptions
from cpupathtrace_tpu.core.rays import Rays
from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_dragon_scene


def _rays(n=1024):
    return Rays(
        origin=jnp.zeros((n, 3)),
        direction=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
    )


@pytest.fixture(scope="module")
def dragon_scene():
    return bench_dragon_scene(dragon_tris=8000, accel="binned")


def test_box_megakernel_lowers_for_tpu():
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

    scene = bench_box_scene()
    opts = RenderOptions(16, 16, 4, 4, epsilon=1e-3, max_depth=6)
    exp = export.export(
        jax.jit(lambda r: trace_megakernel(scene, r, opts, 7)),
        platforms=["tpu"],
    )(_rays())
    assert len(exp.mlir_module_serialized) > 0


def test_binned_megakernel_lowers_for_tpu(dragon_scene):
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

    opts = RenderOptions(16, 16, 4, 4, epsilon=1e-3, max_depth=6)
    exp = export.export(
        jax.jit(lambda r: trace_megakernel(dragon_scene, r, opts, 7)),
        platforms=["tpu"],
    )(_rays())
    assert len(exp.mlir_module_serialized) > 0


def test_sorted_wavefront_lowers_for_tpu(dragon_scene):
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )

    opts = RenderOptions(16, 16, 4, 4, epsilon=1e-3, max_depth=6)
    exp = export.export(
        jax.jit(lambda r: trace_megakernel_sorted(dragon_scene, r, opts, 7)),
        platforms=["tpu"],
    )(_rays())
    assert len(exp.mlir_module_serialized) > 0
