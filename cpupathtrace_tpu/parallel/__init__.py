from .geometry import (
    make_gp_mesh,
    render_chunk_gp,
    render_gp,
    shard_scene_geometry,
)
from .failover import ping_mesh, render_resumable_elastic
from .mesh import make_render_mesh
from .render import (
    adaptive_sample_axis,
    render_chunk_batched_sharded,
    render_chunk_sharded,
    render_sharded,
    render_sharded_adaptive,
)
