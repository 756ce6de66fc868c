from .mesh import make_render_mesh
from .render import render_chunk_sharded, render_sharded
