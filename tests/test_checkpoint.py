"""Checkpoint/resume tests: resumed renders are bit-identical to
uninterrupted ones (capability absent from the reference, SURVEY §5)."""
import numpy as np
import pytest

from cpupathtrace_tpu import RenderOptions, make_camera
from cpupathtrace_tpu.integrator.checkpoint import (
    load_checkpoint,
    render_resumable,
    save_checkpoint,
)
from tests.scenes_util import inward_box_scene


def _setup():
    scene = inward_box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    opts = RenderOptions(8, 8, 16, 16, max_depth=6)
    return scene, cam, opts


def test_uninterrupted_render(tmp_path):
    scene, cam, opts = _setup()
    state = render_resumable(scene, cam, opts, spp=16, spp_chunk=4)
    assert state.chunks_done == 4
    img = state.image()
    assert img.shape == (8, 8, 4)
    np.testing.assert_allclose(img[..., 3], 1.0)
    assert img[..., :3].mean() > 0.0


def test_resume_bit_identical(tmp_path):
    scene, cam, opts = _setup()
    ckpt = str(tmp_path / "film.npz")

    # Full render, checkpointing every chunk.
    full = render_resumable(
        scene, cam, opts, spp=16, spp_chunk=4, checkpoint_path=ckpt
    )

    # Simulate an interruption: rewind the checkpoint to 2 chunks done.
    half = load_checkpoint(ckpt)
    base = render_resumable(scene, cam, opts, spp=8, spp_chunk=4,
                            checkpoint_path=None)
    half.pixel_sum = base.pixel_sum
    half.sample_count = base.sample_count
    half.chunks_done = 2
    save_checkpoint(ckpt, half)

    resumed = render_resumable(
        scene, cam, opts, spp=16, spp_chunk=4, checkpoint_path=ckpt
    )
    np.testing.assert_array_equal(resumed.pixel_sum, full.pixel_sum)
    np.testing.assert_array_equal(resumed.sample_count, full.sample_count)


def test_mismatched_config_rejected(tmp_path):
    import pytest

    scene, cam, opts = _setup()
    ckpt = str(tmp_path / "film.npz")
    render_resumable(scene, cam, opts, spp=8, spp_chunk=4, checkpoint_path=ckpt)
    with pytest.raises(ValueError):
        render_resumable(scene, cam, opts, spp=8, spp_chunk=2, checkpoint_path=ckpt)


def test_mismatched_spp_rejected(tmp_path):
    """Resuming a finished spp=8 checkpoint with spp=16 must be rejected:
    the ceil-division chunk schedule depends on spp, so a silent resume
    would render the wrong number of samples."""
    import pytest

    scene, cam, opts = _setup()
    ckpt = str(tmp_path / "film.npz")
    render_resumable(scene, cam, opts, spp=8, spp_chunk=4, checkpoint_path=ckpt)
    with pytest.raises(ValueError):
        render_resumable(
            scene, cam, opts, spp=16, spp_chunk=4, checkpoint_path=ckpt
        )


def test_sharded_resume_bit_identical(tmp_path, cpu_devices):
    """A sharded render interrupted after its first chunk and resumed from
    the checkpoint is bit-identical to an uninterrupted run on the same
    mesh (the multi-host resume story, SURVEY §5 checkpoint row)."""
    from cpupathtrace_tpu.parallel import make_render_mesh

    scene, cam, opts = _setup()
    mesh = make_render_mesh()
    full = render_resumable(
        scene, cam, opts, spp=12, seed=3, spp_chunk=4, mesh=mesh
    )

    ck = str(tmp_path / "sharded.ckpt")

    class Interrupt(Exception):
        pass

    def bomb(done, total):
        if done == 1:
            raise Interrupt

    with pytest.raises(Interrupt):
        render_resumable(
            scene, cam, opts, spp=12, seed=3, spp_chunk=4,
            checkpoint_path=ck, progress_callback=bomb, mesh=mesh,
        )
    resumed = render_resumable(
        scene, cam, opts, spp=12, seed=3, spp_chunk=4,
        checkpoint_path=ck, mesh=mesh,
    )
    assert resumed.chunks_done == 3
    np.testing.assert_array_equal(full.pixel_sum, resumed.pixel_sum)
    np.testing.assert_array_equal(full.sample_count, resumed.sample_count)


def test_sharded_resume_rejects_bad_chunk_divisibility(cpu_devices):
    from cpupathtrace_tpu.parallel import make_render_mesh

    scene, cam, opts = _setup()
    mesh = make_render_mesh(sample_axis=2)
    with pytest.raises(ValueError, match="sample-parallel"):
        render_resumable(
            scene, cam, opts, spp=9, seed=0, spp_chunk=3, mesh=mesh
        )


def test_elastic_failover_resumes_on_smaller_mesh(tmp_path, cpu_devices):
    """Failure detection + elastic recovery (SURVEY §5): a render whose
    chunk fails mid-way on the big mesh falls back to a smaller mesh and
    RESUMES from the checkpoint — completed chunks are never re-rendered
    and the film ends with exactly `spp` samples everywhere."""
    import jax

    from cpupathtrace_tpu.parallel import (
        make_render_mesh,
        ping_mesh,
        render_resumable_elastic,
    )

    scene, cam, opts = _setup()
    mesh8 = make_render_mesh()
    mesh1 = make_render_mesh(jax.devices()[:1])
    ok, dt = ping_mesh(mesh8)
    assert ok, f"healthy mesh failed ping ({dt:.1f}s)"

    ck = str(tmp_path / "elastic.ckpt")
    calls = {"n": 0}
    failovers = []

    def flaky_progress(done, total):
        # Simulate losing a device after the second chunk completes on
        # the first mesh (the checkpoint for chunks 1-2 is on disk).
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated device loss")

    state = render_resumable_elastic(
        scene, cam, opts, spp=16, checkpoint_path=ck,
        meshes=[mesh8, mesh1], seed=4, spp_chunk=4,
        progress_callback=flaky_progress,
        on_failover=lambda mi, e: failovers.append((mi, str(e))),
    )
    assert failovers and failovers[0][0] == 0
    assert state.chunks_done == 4
    assert (state.sample_count == 16).all()
    img = state.image()
    assert np.isfinite(img).all() and img[..., :3].mean() > 0.01
