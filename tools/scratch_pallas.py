"""Scratch: pallas kernel parity vs brute force (interpret mode on CPU)."""
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from lumillyrender_tpu.accel.pack import build_tri_bvh
from lumillyrender_tpu.scene.data import Bvh, Geometry
from lumillyrender_tpu.ops.intersect import (
    intersect_bvh,
    intersect_shade_brute,
)

rng = np.random.default_rng(0)
T, S, N = 300, 5, 2000

p0 = rng.normal(size=(T, 3)).astype(np.float32)
e1 = (rng.normal(size=(T, 3)) * 0.4).astype(np.float32)
e2 = (rng.normal(size=(T, 3)) * 0.4).astype(np.float32)
nrm = np.cross(e1, e2)
nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
tmat = rng.integers(0, 4, size=T).astype(np.int32)

sc = rng.normal(size=(S, 3)).astype(np.float32) * 1.5
sr = (rng.uniform(0.2, 0.6, size=S)).astype(np.float32)
smat = rng.integers(0, 4, size=S).astype(np.int32)

geom = Geometry(
    tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
    tri_n=jnp.asarray(nrm), tri_mat=jnp.asarray(tmat),
    sph_c=jnp.asarray(sc), sph_r=jnp.asarray(sr), sph_mat=jnp.asarray(smat),
)
arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=16)
bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})

o = rng.normal(size=(N, 3)).astype(np.float32) * 3.0
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o)
d = jnp.asarray(d)

hit_b, sp_b = intersect_shade_brute(o, d, geom)
hit_p, sp_p = intersect_bvh(
    o, d, geom, bvh, want_shade=True, use_pallas=True, pallas_interpret=True
)

t_b = np.asarray(hit_b.t)
t_p = np.asarray(hit_p.t)
p_b = np.asarray(hit_b.prim)
p_p = np.asarray(hit_p.prim)

print("hits brute:", (p_b >= 0).sum(), "pallas:", (p_p >= 0).sum())
bad_t = np.abs(t_b - t_p) > 1e-3 * np.maximum(1, np.abs(t_b))
print("t mismatches:", bad_t.sum(), "max diff:", np.abs(t_b - t_p).max())
# prim may differ only where t ties within tolerance
prim_diff = (p_b != p_p) & ~bad_t
if prim_diff.sum():
    idx = np.nonzero(prim_diff)[0][:5]
    print("prim diffs (t-ties):", prim_diff.sum(), t_b[idx], t_p[idx])
mat_diff = (np.asarray(sp_b.mat) != np.asarray(sp_p.mat)) & (p_b == p_p)
print("mat mismatch (same prim):", mat_diff.sum())
n_diff = (
    np.abs(np.asarray(sp_b.normal) - np.asarray(sp_p.normal)).max(axis=1)
    * (p_b == p_p)
)
print("normal max diff (same prim):", n_diff.max())
assert bad_t.sum() == 0
print("PARITY OK")

# gradient smoke: d(sum t)/d(o) via pallas vs via XLA bvh path
def f_pallas(o_):
    h, _ = intersect_bvh(o_, d, geom, bvh, want_shade=True, use_pallas=True,
                         pallas_interpret=True)
    return jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0))

def f_xla(o_):
    # The XLA BVH walk is while_loop-based (not reverse-differentiable);
    # the brute path is the differentiable oracle.
    h, _ = intersect_shade_brute(o_, d, geom)
    return jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0))

g_p = jax.grad(f_pallas)(o)
g_x = jax.grad(f_xla)(o)
gd = np.abs(np.asarray(g_p) - np.asarray(g_x)).max()
print("grad max diff vs XLA path:", gd)
assert gd < 2e-2, gd
print("GRAD OK")
