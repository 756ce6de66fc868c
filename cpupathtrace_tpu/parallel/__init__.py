from .geometry import (
    make_gp_mesh,
    render_chunk_gp,
    render_gp,
    shard_scene_geometry,
)
from .mesh import make_render_mesh
from .render import render_chunk_sharded, render_sharded
