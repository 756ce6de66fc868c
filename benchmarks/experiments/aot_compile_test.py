"""Time ONLY lower+compile of the full-scale bounce program (abstract
shapes, zero data transfer)."""
import json, os, struct, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
import jax.numpy as jnp

path = sys.argv[1]  # scene cache file (header only is read)
with open(path, "rb") as f:
    assert f.read(8) == b"PTXSCENE"
    (hlen,) = struct.unpack("<Q", f.read(8))
    header = json.loads(f.read(hlen).decode())
shapes = {e["name"]: (tuple(e["shape"]), e["dtype"]) for e in header["arrays"]}
meta = header["meta"]

from cpupathtrace_tpu.integrator.sorted_wavefront import _bounce_call, N_STATE
from cpupathtrace_tpu.integrator.pallas_megakernel import _KRN_BLOCK_ROWS

S = lambda n: jax.ShapeDtypeStruct(*[shapes[n][0], np.dtype(shapes[n][1])])
def sd(shape, dt=np.float32):
    return jax.ShapeDtypeStruct(shape, np.dtype(dt))

# _pack_tables output shapes: tri/sph/mat/lgt/em SMEM tables. Use the real
# field shapes from the header where available; approximate SMEM packs.
n_tri = meta["n_big"]; n_sph = 0
tables = (
    sd((max(n_tri, 1), 13)), sd((1, 5)), sd((3, 13)), sd((1, 7)),
    sd((max(meta["n_emissive"], 1), 14)),
    S("krn_sup_bounds"), S("krn_hyp_bounds"), S("krn_cl_bounds"),
    S("krn_records"), S("krn_big_pair"),
)
rows = 2048
state = tuple(
    sd((rows, 128), np.uint32 if i == 0 else np.float32)
    for i in range(N_STATE)
)
statics = dict(
    n_tri=n_tri, n_sph=0, n_mat=3, n_lights=0, n_em=meta["n_emissive"],
    em_k=meta["emissive_sample_count"], epsilon=1.0003e-3,
    n_super=shapes["krn_cl_bounds"][0][0], block_rows=_KRN_BLOCK_ROWS,
    dense_pair=False, cull_mode=meta["krn_cull_mode"],
    big_cull_mode=meta["krn_big_cull_mode"], debug_visits=False,
)
t0 = time.time()
lowered = _bounce_call.lower(tables, sd((2,), np.int32), state, **statics)
t1 = time.time()
compiled = lowered.compile()
t2 = time.time()
print(f"lower {t1-t0:.1f}s  compile {t2-t1:.1f}s")
