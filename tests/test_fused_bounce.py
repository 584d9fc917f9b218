"""Per-lane parity: fused Pallas bounce kernel vs the XLA bounce step.

The fused kernel (ops/pallas_bounce.py) reimplements the ENTIRE per-bounce
transition — intersection, sky, emission, RR, NEE, BSDF sample/eval — so it
is gated lane-by-lane against `make_bounce_step` (the tested XLA reference)
on real compiled scenes covering every material family, both integrators
and several bounce depths. Interpreter mode here (CPU CI); the same
comparison runs compiled on hardware in tools/bench_fused.py.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.integrator.wavefront import PathState, make_bounce_step
from lumillyrender_tpu.ops import pallas_bounce
from lumillyrender_tpu.scene.compiler import compile_scene, compile_scene_file
from lumillyrender_tpu.scene.loader import parse_config

SEED = 77
N = 1536  # deliberately NOT a multiple of PACKET: exercises padding


GGX_REFR_SCENE = """
[renderer]
samples = 4
integrator = "pt"

[film]
resolution = [16, 16]
output = "png"

[sky]
type = "uniform"
color = [0.6, 0.7, 0.9]

[camera]
type = "ideal-pinhole"
fov = 60
[[camera.transform]]
type = "look-at"
origin = [0, 1, 4]
target = [0, 1, 0]
up = [0, 1, 0]

[[object]]
mesh = "ball"
material = "rough"
[[object.transform]]
type = "translate"
vector = [-0.8, 0.6, 0]

[[object]]
mesh = "ball"
material = "glass"
[[object.transform]]
type = "translate"
vector = [0.8, 0.6, 0]

[[object]]
mesh = "ball"
material = "shiny"
[[object.transform]]
type = "translate"
vector = [0, 1.8, 0]

[[object]]
mesh = "ball"
material = "blinn"
[[object.transform]]
type = "translate"
vector = [0, 0.6, -1.6]

[[object]]
mesh = "floor"
material = "diffuse"
[[object.transform]]
type = "translate"
vector = [0, -1000, 0]

[[material]]
name = "rough"
type = "ggx"
reflectance = [0.9, 0.8, 0.7]
roughness = 0.4
ior = 1.8

[[material]]
name = "glass"
type = "ideal-refraction"
reflectance = [0.95, 0.95, 0.95]
ior = 1.5
absorbtance = 0.2

[[material]]
name = "shiny"
type = "phong"
reflectance = [0.8, 0.8, 0.8]
alpha = 40

[[material]]
name = "blinn"
type = "blinn-phong"
reflectance = [0.7, 0.8, 0.9]
alpha = 25

[[material]]
name = "diffuse"
type = "lambert"
albedo = [0.6, 0.5, 0.4]

[[mesh]]
name = "ball"
type = "sphere"
radius = 0.6

[[mesh]]
name = "floor"
type = "sphere"
radius = 1000
"""


def _random_state(rng, scene, n=N):
    """A plausible wavefront: random origins near the scene, unit dirs."""
    g = scene.geometry
    pts = []
    if g.tri_p0.shape[0]:
        pts.append(np.asarray(g.tri_p0))
    if g.sph_c.shape[0]:
        pts.append(np.asarray(g.sph_c))
    ref = np.concatenate(pts, axis=0)
    lo, hi = ref.min(axis=0) - 1.0, ref.max(axis=0) + 1.0
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    thr = rng.uniform(0.1, 1.5, size=(n, 3)).astype(np.float32)
    acc = rng.uniform(0.0, 0.5, size=(n, 3)).astype(np.float32)
    alive = rng.random(n) < 0.85
    lane = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    return o, d, thr, acc, alive, lane


def _mk_state(parts, bounce):
    o, d, thr, acc, alive, lane = parts
    return PathState(
        bounce=jnp.int32(bounce),
        o=jnp.asarray(o), d=jnp.asarray(d),
        throughput=jnp.asarray(thr), accum=jnp.asarray(acc),
        alive=jnp.asarray(alive), rays_traced=jnp.float32(0.0),
        lane=jnp.asarray(lane),
    )


def _assert_states_close(sx, sp, tag, atol=2e-4):
    """Lanes where float-contraction noise flipped a DISCONTINUOUS decision
    are excluded (bounded below):

    * intersection tie flips — different FMA grouping picking a different
      but equidistant winner prim;
    * checker-boundary flips — geometry lying exactly on a checker line
      (new-cbox's x=0 wall) makes pos.x a catastrophic-cancellation residue
      whose SIGN decides the texel; the XLA path itself already yields a
      pseudo-random 0.5/0.6/0.8/1.0 mix there (measured: 4075 wall rays ->
      {0.8: 2220, 1.0: 1631, 0.6: 132, 0.5: 92}), as would the Rust
      reference. Both implementations are self-consistent; they just land
      on different sides of the measure-zero line per lane.
    """
    from lumillyrender_tpu.ops import bsdf
    import jax.numpy as jnp

    ox, op = np.asarray(sx.o), np.asarray(sp.o)
    # Tie flip: changed hit prim -> large coordinate jump.
    scale = np.abs(ox).max() + 1.0
    tie = (np.abs(ox - op).max(axis=1) / scale) > 1e-3
    ck_x = np.asarray(bsdf.checker(jnp.asarray(ox[:, 0]), jnp.asarray(ox[:, 2])))
    ck_p = np.asarray(bsdf.checker(jnp.asarray(op[:, 0]), jnp.asarray(op[:, 2])))
    ck_flip = ck_x != ck_p
    lane_bad = tie | ck_flip
    assert tie.mean() < 0.004, f"{tag}: {tie.mean():.2%} tie flips"
    assert lane_bad.mean() < 0.08, f"{tag}: {lane_bad.mean():.2%} excluded"
    keep = ~lane_bad

    def cmp(a, b, name, rtol=2e-3, flip_frac=0.0):
        """flip_frac > 0 additionally tolerates that fraction of kept lanes
        disagreeing entirely — binary decisions on measure-zero boundaries
        (NEE shadow verdict |t - dist| <= EPS exactly on the light surface)
        that float contraction can flip either way."""
        a, b = np.asarray(a), np.asarray(b)
        a = a[keep] if a.ndim else a
        b = b[keep] if b.ndim else b
        denom = np.maximum(np.abs(a), 1.0)
        bad = np.abs(a - b) / denom
        if flip_frac:
            lane_flip = bad.reshape(bad.shape[0], -1).max(axis=1) > rtol
            assert lane_flip.mean() <= flip_frac, (
                f"{tag}/{name}: {lane_flip.mean():.2%} flipped lanes"
            )
            bad = bad[~lane_flip]
        assert bad.max() < rtol, (
            f"{tag}/{name}: max rel diff {bad.max():.2e}"
        )

    cmp(sx.o, sp.o, "o")
    cmp(sx.d, sp.d, "d")
    cmp(sx.throughput, sp.throughput, "throughput")
    cmp(sx.accum, sp.accum, "accum", flip_frac=0.005)
    assert (np.asarray(sx.alive)[keep] == np.asarray(sp.alive)[keep]).all(), (
        f"{tag}: alive mismatch"
    )
    assert abs(float(sx.rays_traced) - float(sp.rays_traced)) <= (
        lane_bad.sum() + 0.5
    ), f"{tag}: rays {float(sx.rays_traced)} vs {float(sp.rays_traced)}"


def _compare(compiled, tag, bounces=(0, 3, 7, 70)):
    scene, settings = compiled.data, compiled.settings
    assert pallas_bounce.supported(scene, settings), tag
    step_xla = make_bounce_step(scene, settings, SEED)
    step_pal = pallas_bounce.make_step(scene, settings, SEED, interpret=True)
    rng = np.random.default_rng(hash(tag) % (2**31))
    for bounce in bounces:
        parts = _random_state(rng, scene)
        sx = step_xla(_mk_state(parts, bounce))
        sp = step_pal(_mk_state(parts, bounce))
        _assert_states_close(sx, sp, f"{tag}@b{bounce}")


def test_fused_matches_xla_new_cbox(assets_dir):
    """Flagship: 12 tris + 2 spheres, NEE, 2 light prims, lambert-only."""
    c = compile_scene_file(assets_dir / "new-cbox.toml", spp=1)
    _compare(c, "new-cbox")


def test_fused_matches_xla_primitive(assets_dir):
    """Pure pt, lambert + checker floor quad, bright sky."""
    c = compile_scene_file(assets_dir / "primitive.toml", spp=1)
    _compare(c, "primitive")


def test_fused_matches_xla_debug_nee(assets_dir):
    """Sphere light NEE + no-direct-emitter."""
    c = compile_scene_file(assets_dir / "debug-nee.toml", spp=1)
    _compare(c, "debug-nee")


def test_fused_matches_xla_all_families():
    """GGX + refraction + phong + blinn-phong + lambert in one scene."""
    c = compile_scene(parse_config(GGX_REFR_SCENE), spp=1)
    _compare(c, "families")


def test_fused_render_matches_xla_render(assets_dir, monkeypatch):
    """End-to-end: full renders with the fused step forced on (interpret
    mode) vs the XLA step must produce the same film."""
    from lumillyrender_tpu.integrator.render import render
    from lumillyrender_tpu.integrator import wavefront

    c = compile_scene_file(assets_dir / "new-cbox.toml", spp=4)
    c.settings = dataclasses.replace(c.settings, width=32, height=32)
    r_xla = render(c, seed=3)

    orig = make_bounce_step

    def patched(scene, settings, seed, mats_eval=None, allow_fused=True):
        if mats_eval is None and pallas_bounce.supported(scene, settings):
            return pallas_bounce.make_step(scene, settings, seed,
                                           interpret=True)
        return orig(scene, settings, seed, mats_eval=mats_eval)

    monkeypatch.setattr(wavefront, "make_bounce_step", patched)
    r_pal = render(c, seed=3)
    diff = np.abs(r_xla.film - r_pal.film)
    assert diff.max() < 1e-3, diff.max()


def test_fused_supported_gating(assets_dir):
    """Scenes the kernel cannot serve must be rejected by `supported`."""
    c = compile_scene_file(assets_dir / "many-light.toml", spp=1)
    assert not pallas_bounce.supported(c.data, c.settings)  # 256 lights
    c2 = compile_scene_file(assets_dir / "sample.toml", spp=1)
    assert not pallas_bounce.supported(c2.data, c2.settings)  # 82k tris
    c3 = compile_scene_file(assets_dir / "welcome-geo.toml", spp=1)
    assert not pallas_bounce.supported(c3.data, c3.settings)  # IBL sky


# ---------------------------------------------------------------------------
# Hand-written backward kernel gates (ops/pallas_bounce.py make_step_diff)
#
# Two complementary gates, neither contaminated by chaotic trajectory
# divergence (tiny f32 differences between two implementations compound
# over bounces into discrete-decision flips — both sides stay unbiased but
# full-render outputs cannot be compared lane-by-lane):
#   1. SINGLE-bounce VJP parity: cotangents from the custom bwd kernel vs
#      jax.vjp of the XLA step on the same fixed state (no accumulation).
#   2. FD-vs-AD on the fused path ITSELF (test_fused_diff_*_fd): finite
#      differences of the fused primal against the hand-VJP gradients —
#      self-consistent, the same gate test_diff.py applies to the XLA path.
# ---------------------------------------------------------------------------


def _xla_step_fn(scene, settings, seed):
    from lumillyrender_tpu.integrator import wavefront

    def run(state, mats, sky):
        sc = dataclasses.replace(scene, sky=sky)
        step = wavefront.make_bounce_step(sc, settings, seed,
                                          mats_eval=mats, allow_fused=False)
        return step(state)

    return run


def _zero_cotangent_like(state, rng):
    import jax

    f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    r = lambda shape: jnp.asarray(
        rng.normal(size=shape).astype(np.float32)
    )
    return PathState(
        bounce=f0(state.bounce),
        o=r(state.o.shape), d=r(state.d.shape),
        throughput=r(state.throughput.shape), accum=r(state.accum.shape),
        alive=f0(state.alive), rays_traced=jnp.float32(0.0),
        lane=f0(state.lane),
    )


def _compare_bwd(compiled, tag, bounce=6):
    """Single-bounce cotangent parity: custom bwd kernel vs XLA autodiff."""
    import jax

    from lumillyrender_tpu.diff.render import params_of
    from lumillyrender_tpu.ops import bsdf

    scene, settings = compiled.data, compiled.settings
    assert pallas_bounce.supported_diff(scene, settings), tag
    params = params_of(scene)
    mats, sky = params.materials, params.sky
    rng = np.random.default_rng(hash(tag) % (2**31) + 7)
    parts = _random_state(rng, scene)
    state = _mk_state(parts, bounce)
    g = _zero_cotangent_like(state, rng)

    xla_run = _xla_step_fn(scene, settings, SEED)
    out_x, pull_x = jax.vjp(xla_run, state, mats, sky)

    def pal_run(st, m, sk):
        # The step closes over scene.sky — route the traced sky in by
        # rebuilding the step on a scene carrying it (matches how
        # render_diff passes the live sky via scene_s).
        sc = dataclasses.replace(scene, sky=sk)
        return pallas_bounce.make_step_diff(sc, settings, SEED, m,
                                            interpret=True)(st)

    out_p, pull_p = jax.vjp(pal_run, state, mats, sky)

    # Primal discontinuity flips (tie/checker/NEE verdict) make those
    # lanes' cotangents incomparable. Every backward contribution is
    # LINEAR in that lane's incoming cotangent, so zeroing the cotangents
    # on flip lanes BEFORE the pullback removes their influence from the
    # table-gradient sums on BOTH sides — the comparison is then tight,
    # with no leakage allowance. Detection thresholds are deliberately
    # over-inclusive (near-boundary lanes excluded too).
    ox, op = np.asarray(out_x.o), np.asarray(out_p.o)
    scale = np.abs(ox).max() + 1.0
    tie = (np.abs(ox - op).max(axis=1) / scale) > 1e-5
    ck_flip = np.asarray(
        bsdf.checker(jnp.asarray(ox[:, 0]), jnp.asarray(ox[:, 2]))
    ) != np.asarray(
        bsdf.checker(jnp.asarray(op[:, 0]), jnp.asarray(op[:, 2]))
    )
    acc_x, acc_p = np.asarray(out_x.accum), np.asarray(out_p.accum)
    nee_flip = (
        np.abs(acc_x - acc_p) / np.maximum(np.abs(acc_x), 1.0)
    ).max(axis=1) > 1e-4
    thr_x, thr_p = np.asarray(out_x.throughput), np.asarray(out_p.throughput)
    thr_flip = (
        np.abs(thr_x - thr_p) / np.maximum(np.abs(thr_x), 1.0)
    ).max(axis=1) > 1e-4
    # Grazing-sample lanes: the XLA backward evaluates the analytically
    # canceling cos/pdf gradient pair numerically, which is 1/cos^2
    # cancellation NOISE for |cos| ~ 0 (the hand-VJP uses the exact zero).
    # Those lanes' XLA cotangents are garbage by construction — excluded.
    from lumillyrender_tpu.ops.intersect import intersect_shade_brute

    _, sp_hit = intersect_shade_brute(state.o, state.d, scene.geometry)
    cos_out = np.abs(
        np.sum(np.asarray(out_x.d) * np.asarray(sp_hit.normal), axis=1)
    )
    grazing = np.asarray(out_x.alive) & (cos_out < 3e-2)
    keep = ~(tie | ck_flip | nee_flip | thr_flip | grazing)
    assert keep.mean() > 0.85, f"{tag}: only {keep.mean():.0%} comparable"

    mask = jnp.asarray(keep)[:, None].astype(jnp.float32)
    g_masked = g._replace(
        o=g.o * mask, d=g.d * mask, throughput=g.throughput * mask,
        accum=g.accum * mask,
    )
    sb_x, mb_x, kb_x = pull_x(g_masked)
    sb_p, mb_p, kb_p = pull_p(g_masked)

    def cmp_lanes(a, b, name, rtol=8e-3):
        a, b = np.asarray(a)[keep], np.asarray(b)[keep]
        denom = np.maximum(np.abs(a).max(), 1e-6)
        rel = np.abs(a - b) / denom
        assert rel.max() < rtol, f"{tag}/{name}: rel {rel.max():.2e}"

    cmp_lanes(sb_x.o, sb_p.o, "o_bar")
    cmp_lanes(sb_x.d, sb_p.d, "d_bar")
    cmp_lanes(sb_x.throughput, sb_p.throughput, "thr_bar")
    cmp_lanes(sb_x.accum, sb_p.accum, "acc_bar")

    def cmp_table(a, b, name, rtol=5e-3):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-6)
        rel = np.abs(a - b) / denom
        assert rel.max() < rtol, f"{tag}/{name}: rel {rel.max():.2e}"

    cmp_table(mb_x.color, mb_p.color, "albedo_bar")
    cmp_table(mb_x.emission, mb_p.emission, "emission_bar")
    cmp_table(kb_x.color, kb_p.color, "sky_bar")


def test_fused_bwd_matches_xla_vjp_new_cbox(assets_dir):
    c = compile_scene_file(assets_dir / "new-cbox.toml", spp=1)
    _compare_bwd(c, "new-cbox")


def test_fused_bwd_matches_xla_vjp_debug_nee(assets_dir):
    """Sphere light: shadow-hit sphere-normal cotangent chain."""
    c = compile_scene_file(assets_dir / "debug-nee.toml", spp=1)
    _compare_bwd(c, "debug-nee")


def test_fused_bwd_matches_xla_vjp_primitive(assets_dir):
    """Pure pt: sky cotangents + main-hit sphere-normal chain."""
    c = compile_scene_file(assets_dir / "primitive.toml", spp=1)
    _compare_bwd(c, "primitive")


LAMBERT_DIFF_SCENE = """
[renderer]
samples = 4
integrator = "pt-direct"
depth = 3
depth-limit = 8

[film]
resolution = [12, 12]
output = "png"

[sky]
type = "uniform"
color = [0.4, 0.5, 0.6]

[camera]
type = "ideal-pinhole"
fov = 45
[[camera.transform]]
type = "look-at"
origin = [165, 0, 135]
target = [165, 0, 165]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [6, 5, 4]

[[object]]
name = "lamp"
mesh = "ball"
material = "black"
[[object.transform]]
type = "translate"
vector = [165, 9, 165]

[[object]]
mesh = "ball"
material = "diffuse"
[[object.transform]]
type = "translate"
vector = [163, 0, 165]

[[object]]
mesh = "ball"
material = "gray"
[[object.transform]]
type = "translate"
vector = [168, 0, 168]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[material]]
name = "diffuse"
type = "lambert"
albedo = [0.6, 0.45, 0.3]

[[material]]
name = "gray"
type = "lambert"
albedo = [0.5, 0.5, 0.5]

[[mesh]]
name = "ball"
type = "sphere"
radius = 2
"""


def _fused_scene(max_bounces=5, spp=4):
    c = compile_scene(parse_config(LAMBERT_DIFF_SCENE), spp=spp)
    c.settings = dataclasses.replace(c.settings, max_bounces=max_bounces,
                                     fused="on")
    assert pallas_bounce.supported_diff(c.data, c.settings)
    return c


def test_fused_diff_albedo_fd():
    from test_diff import _set_mat, fd_vs_ad

    c = _fused_scene()
    g_ad, _ = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.color[1, 0],
        set_leaf=lambda p, v: _set_mat(p, "color", (1, 0), v),
        eps=2e-2, atol=2e-4, rtol=0.08,
    )
    assert g_ad > 0


def test_fused_diff_emission_fd():
    from test_diff import _set_mat, fd_vs_ad

    c = _fused_scene()
    g_ad, _ = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.emission[0, 1],
        set_leaf=lambda p, v: _set_mat(p, "emission", (0, 1), v),
        eps=0.5, atol=1e-5, rtol=0.05,
    )
    assert g_ad > 0


def test_fused_diff_sky_fd():
    import jax.numpy as jnp

    from test_diff import fd_vs_ad

    def set_sky(p, v):
        sky = dataclasses.replace(p.sky, color=p.sky.color.at[1].set(v))
        return p._replace(sky=sky)

    c = _fused_scene()
    g_ad, _ = fd_vs_ad(
        c,
        get_leaf=lambda p: p.sky.color[1],
        set_leaf=set_sky,
        eps=5e-2, atol=1e-5, rtol=0.05,
    )
    assert g_ad > 0


def test_fused_diff_camera_fd():
    from test_diff import _set_cam, fd_vs_ad

    c = _fused_scene(max_bounces=3)
    fd_vs_ad(
        c,
        get_leaf=lambda p: p.camera.aperture_position[2],
        set_leaf=lambda p, v: _set_cam(p, "aperture_position", 2, v),
        eps=5e-2, atol=2e-3, rtol=0.25,
    )


GLOSSY_DIFF_SCENE = LAMBERT_DIFF_SCENE.replace(
    """[[material]]
name = "diffuse"
type = "lambert"
albedo = [0.6, 0.45, 0.3]""",
    """[[material]]
name = "diffuse"
type = "ggx"
reflectance = [0.8, 0.75, 0.7]
roughness = 0.45
ior = 12""",
)


def _hybrid_scene(max_bounces=5, spp=4):
    c = compile_scene(parse_config(GLOSSY_DIFF_SCENE), spp=spp)
    c.settings = dataclasses.replace(c.settings, max_bounces=max_bounces,
                                     fused="on")
    assert not pallas_bounce.supported_diff(c.data, c.settings)
    assert pallas_bounce.supported_diff_hybrid(c.data, c.settings)
    return c


def test_hybrid_diff_roughness_fd():
    """FD-vs-AD through the HYBRID step (fused Pallas fwd + XLA-vjp bwd)
    for a GGX roughness parameter — the family the hand-VJP doesn't
    cover."""
    from test_diff import _set_mat, fd_vs_ad

    c = _hybrid_scene()
    g_ad, _ = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.alpha[1],
        set_leaf=lambda p, v: _set_mat(p, "alpha", 1, v),
        eps=4e-2, atol=2e-4, rtol=0.15,
    )
    assert np.isfinite(g_ad)


def test_hybrid_diff_reflectance_fd():
    from test_diff import _set_mat, fd_vs_ad

    c = _hybrid_scene()
    g_ad, _ = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.color[1, 0],
        set_leaf=lambda p, v: _set_mat(p, "color", (1, 0), v),
        eps=2e-2, atol=2e-4, rtol=0.1,
    )
    assert g_ad > 0


def test_hybrid_grads_match_xla_path():
    """The hybrid's gradients must match the pure-XLA diff path's: the
    backward IS the XLA step's vjp and the RNG trajectories are identical
    (fused-vs-XLA forward parity), so agreement is tight — far tighter
    than FD tolerances."""
    import jax

    from test_diff import objective

    c_h = _hybrid_scene()
    c_x = compile_scene(parse_config(GLOSSY_DIFF_SCENE), spp=4)
    c_x.settings = dataclasses.replace(
        c_x.settings, max_bounces=5, fused="off"
    )

    from lumillyrender_tpu.diff.render import params_of

    p0 = params_of(c_h.data)
    g_h = jax.jit(jax.grad(lambda p: objective(c_h, p, p0),
                           allow_int=True))(p0)
    g_x = jax.jit(jax.grad(lambda p: objective(c_x, p, p0),
                           allow_int=True))(p0)
    for name in ("color", "emission", "alpha", "ior"):
        a = np.asarray(getattr(g_h.materials, name))
        b = np.asarray(getattr(g_x.materials, name))
        denom = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() / denom < 5e-3, (
            name, a, b
        )
    sa = np.asarray(g_h.sky.color)
    sb = np.asarray(g_x.sky.color)
    assert np.abs(sa - sb).max() / (np.abs(sb).max() + 1e-8) < 5e-3


def test_fused_raygen_matches_xla(assets_dir):
    """Pallas ray generation (pinhole, tiled pow2 film) must match the XLA
    path bit-for-bit: same pcg4d draws, same pixel decode, same sensor
    math."""
    import jax.numpy as jnp

    from lumillyrender_tpu.integrator.render import tile_decode
    from lumillyrender_tpu.ops import camera as camera_ops
    from lumillyrender_tpu.ops import rng as rng_mod

    c = compile_scene_file(assets_dir / "new-cbox.toml", spp=1)
    scene = c.data
    settings = dataclasses.replace(c.settings, width=64, height=64)
    assert pallas_bounce.raygen_supported(settings)
    w = h = 64
    spp = 2
    n = w * h * spp
    seed, off = 9, 3

    o_p, d_p, g_p = pallas_bounce.generate_rays(
        scene, settings, seed, off, n, interpret=True
    )
    assert g_p is None  # ideal pinhole: g == 1 stays with the caller

    lane = jnp.arange(n, dtype=jnp.uint32)
    glane = lane + jnp.uint32(off) * jnp.uint32(w * h)
    decode = tile_decode(settings)
    px, py = decode(lane % jnp.uint32(w * h))
    u, v, u2, v2 = rng_mod.uniform4(seed, glane, 0x40000000)
    o_x, d_x, pdf, g = camera_ops.sample_rays(
        scene.camera, settings.camera_kind, px, py, w, h, u, v, u2, v2
    )
    assert np.abs(np.asarray(o_p) - np.asarray(o_x)).max() == 0.0
    assert np.abs(np.asarray(d_p) - np.asarray(d_x)).max() < 2e-7
    assert float(np.abs(np.asarray(pdf) - 1).max()) == 0.0  # pinhole
    assert float(np.abs(np.asarray(g) - 1).max()) == 0.0


def test_fused_raygen_thinlens_and_raster(assets_dir):
    """Generalized Pallas ray-gen (round-5): thin-lens and realistic
    pinhole cameras, and non-pow2 (raster-order) films, must match the XLA
    ray-gen: o bit-exact, d/g to float tolerance."""
    import jax.numpy as jnp

    from lumillyrender_tpu.integrator.render import tile_decode
    from lumillyrender_tpu.ops import camera as camera_ops
    from lumillyrender_tpu.ops import rng as rng_mod
    from lumillyrender_tpu.scene.data import CAM_PINHOLE, CAM_THIN_LENS

    c = compile_scene_file(assets_dir / "welcome-geo.toml", spp=1)
    scene = c.data
    assert c.settings.camera_kind == CAM_THIN_LENS
    cases = [
        (64, 64, CAM_THIN_LENS),   # pow2 tiled
        (96, 40, CAM_THIN_LENS),   # non-pow2 raster
        (64, 64, CAM_PINHOLE),     # realistic pinhole
    ]
    for w, h, kind in cases:
        settings = dataclasses.replace(
            c.settings, width=w, height=h, camera_kind=kind
        )
        assert pallas_bounce.raygen_supported(settings), (w, h, kind)
        spp = 2
        n = w * h * spp
        if n % pallas_bounce.PACKET:
            n = (n // pallas_bounce.PACKET + 1) * pallas_bounce.PACKET
        seed, off = 9, 3
        o_p, d_p, g_p = pallas_bounce.generate_rays(
            scene, settings, seed, off, n, interpret=True
        )
        assert g_p is not None

        lane = jnp.arange(n, dtype=jnp.uint32)
        glane = lane + jnp.uint32(off) * jnp.uint32(w * h)
        decode = tile_decode(settings)
        if decode is None:
            px = (lane % w).astype(jnp.int32)
            py = ((lane // w) % h).astype(jnp.int32)
        else:
            px, py = decode(lane % jnp.uint32(w * h))
        u, v, u2, v2 = rng_mod.uniform4(seed, glane, 0x40000000)
        o_x, d_x, pdf, g = camera_ops.sample_rays(
            scene.camera, kind, px, py, w, h, u, v, u2, v2
        )
        o_err = np.abs(np.asarray(o_p) - np.asarray(o_x)).max()
        d_err = np.abs(np.asarray(d_p) - np.asarray(d_x)).max()
        g_rel = (
            np.abs(np.asarray(g_p) - np.asarray(g))
            / np.abs(np.asarray(g))
        ).max()
        assert o_err < 1e-4, (w, h, kind, o_err)  # aperture disk math
        assert d_err < 1e-5, (w, h, kind, d_err)
        assert g_rel < 1e-5, (w, h, kind, g_rel)


def test_fused_raygen_render_matches(assets_dir, monkeypatch):
    """End-to-end: renders differing ONLY by the ray-gen implementation
    (fused Pallas vs XLA; the bounce kernel is disabled for both) must
    agree everywhere except rare chaos flips seeded by the last-ulp
    normalize difference (reciprocal-multiply vs divide)."""
    from lumillyrender_tpu.integrator.render import render

    # Disable the fused BOUNCE kernel so only ray-gen differs.
    monkeypatch.setattr(pallas_bounce, "enabled", lambda sc, st: False)
    monkeypatch.setattr(pallas_bounce, "enabled_diff", lambda sc, st: False)

    # Low bounce depth: the ray-gen difference is ~1 ulp in d (XLA fuses
    # FMA differently across the two programs), which is invisible at
    # depth 2 but amplifies chaotically over 80 bounces (checker/boundary
    # decision flips) — that regime is covered by the bounded-flip bounce
    # kernel gates, not this one.
    c = compile_scene_file(assets_dir / "new-cbox.toml", spp=4)
    c.settings = dataclasses.replace(c.settings, width=64, height=64,
                                     fused="off", max_bounces=2)
    r_x = render(c, seed=5)
    c2 = compile_scene_file(assets_dir / "new-cbox.toml", spp=4)
    c2.settings = dataclasses.replace(c2.settings, width=64, height=64,
                                      fused="on", max_bounces=2)
    r_p = render(c2, seed=5)
    diff = np.abs(r_x.film - r_p.film)
    rel = diff / (np.abs(r_x.film) + 1e-3)
    assert np.median(rel) < 1e-6
    assert (rel > 0.02).mean() < 0.005, (rel > 0.02).mean()
