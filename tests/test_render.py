"""End-to-end integrator gates: analytic furnace identities, pt vs
pt-direct cross-agreement (two independent estimators of the same integral),
sharded-vs-single-device parity, IBL and camera models."""

import dataclasses

import numpy as np
import pytest

from lumillyrender_tpu.integrator.render import render
from lumillyrender_tpu.scene.compiler import compile_scene
from lumillyrender_tpu.scene.loader import parse_config

# A lone convex lambert sphere centered where checker == 1 everywhere on its
# surface (x,z in [160,170]): a cos-sampled bounce has throughput weight
# exactly albedo, the ray then escapes (convexity), so L = albedo * sky with
# ZERO variance — an exact analytic gate through camera/estimator/BSDF/sky.
FURNACE = """
[renderer]
samples = 8
integrator = "pt"

[film]
resolution = [48, 48]
output = "png"
gamma = 1.0

[sky]
type = "uniform"
color = [1, 1, 1]

[camera]
type = "ideal-pinhole"
fov = 40
[[camera.transform]]
type = "look-at"
origin = [165, 0, 135]
target = [165, 0, 165]
up = [0, 1, 0]

[[object]]
material = "m"
mesh = "ball"
[[object.transform]]
type = "translate"
vector = [165, 0, 165]

[[material]]
name = "m"
type = "lambert"
albedo = [ALBEDO, ALBEDO, ALBEDO]

[[mesh]]
name = "ball"
type = "sphere"
radius = 4
"""


def furnace_scene(albedo: float, spp=8):
    cfg = parse_config(FURNACE.replace("ALBEDO", str(albedo)))
    return compile_scene(cfg, spp=spp)


def test_white_furnace_exact():
    c = furnace_scene(1.0)
    r = render(c, seed=3)
    assert np.abs(r.film - 1.0).max() < 1e-3, (
        r.film.min(), r.film.max(),
    )


def test_gray_furnace_exact():
    """Sphere pixels must be EXACTLY albedo (single-bounce convex identity);
    sky pixels exactly 1."""
    spp = 8
    c = furnace_scene(0.37, spp=spp)
    r = render(c, seed=4)
    # Every sample is exactly 0.37 (sphere) or 1.0 (sky); every pixel must
    # lie on the 8-sample mixture lattice (silhouette pixels mix the two).
    lattice = np.array([(0.37 * k + (spp - k)) / spp for k in range(spp + 1)])
    dist = np.abs(r.film.reshape(-1, 1) - lattice[None, :]).min(axis=1)
    assert dist.max() < 1e-3
    assert np.abs(r.film - 0.37).min() < 1e-3  # sphere actually visible


NEE_SCENE = """
[renderer]
samples = SPP
integrator = "INTEGRATOR"
depth = 5
depth-limit = 64

[film]
resolution = [32, 32]
output = "png"

[sky]
type = "uniform"
color = [0, 0, 0]

[camera]
type = "ideal-pinhole"
fov = 60
[[camera.transform]]
type = "look-at"
origin = [0, 1, 4]
target = [0, 1, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [12, 10, 8]

[[object]]
name = "lamp"
mesh = "ball"
material = "black"
[[object.transform]]
type = "translate"
vector = [0, 3.2, 0]

[[object]]
mesh = "floor"
material = "white"
[[object.transform]]
type = "translate"
vector = [0, -1000, 0]

[[object]]
mesh = "ball"
material = "gray"
[[object.transform]]
type = "translate"
vector = [0.8, 0.6, 0]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[material]]
name = "white"
type = "lambert"
albedo = [0.8, 0.8, 0.8]

[[material]]
name = "gray"
type = "lambert"
albedo = [0.5, 0.5, 0.5]

[[mesh]]
name = "ball"
type = "sphere"
radius = 0.6

[[mesh]]
name = "floor"
type = "sphere"
radius = 1000
"""


def nee_scene(integrator: str, spp: int):
    cfg = parse_config(
        NEE_SCENE.replace("SPP", str(spp)).replace("INTEGRATOR", integrator)
    )
    return compile_scene(cfg)


def test_pt_vs_nee_agree():
    """Both integrators are unbiased estimators of the same image — their
    means must agree within combined MC error (the renderer's strongest
    internal cross-check; mirrors the reference's dual-oracle test idea)."""
    r_pt = render(nee_scene("pt", 768), seed=11)
    r_nee = render(nee_scene("pt-direct", 192), seed=12)
    a, b = r_pt.film.mean(axis=2), r_nee.film.mean(axis=2)
    # Compare low-frequency content: mean brightness of the whole image and
    # of quadrants (pixel-wise comparison would need huge spp).
    assert a.mean() > 0.01  # scene is actually lit
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.1, (a.mean(), b.mean())
    h, w = a.shape
    for sy in (slice(0, h // 2), slice(h // 2, h)):
        for sx in (slice(0, w // 2), slice(w // 2, w)):
            qa, qb = a[sy, sx].mean(), b[sy, sx].mean()
            assert abs(qa - qb) / max(qa, 1e-9) < 0.2, (qa, qb)


def test_sharded_matches_single_device():
    """8-way DP must reproduce the single-device film (same global sample
    ids, only the reduction order differs)."""
    from lumillyrender_tpu.parallel.shard import render_sharded

    c = nee_scene("pt-direct", 16)
    r1 = render(c, seed=5)
    r8 = render_sharded(c, seed=5, n_devices=8, spp_per_device=2)
    assert np.abs(r1.film - r8.film).max() < 1e-4


def _films(c, seeds):
    return np.stack([render(c, seed=s).film for s in seeds])


def _zmap(fa, fb):
    """Per-pixel Welch z-statistic between two stacks of i.i.d. films
    (seeds axis 0), on channel-mean luminance. Returns (z, testable):
    a pixel is untestable when one side shows ZERO sample variance while
    the sides disagree — a rare-event pixel this estimator pair cannot
    compare (e.g. grazing geometry where pure pt never hits the tiny lamp
    in any sample but NEE samples it directly; both remain unbiased)."""
    a, b = fa.mean(axis=3), fb.mean(axis=3)
    ma, mb = a.mean(axis=0), b.mean(axis=0)
    va = a.var(axis=0, ddof=1) / a.shape[0]
    vb = b.var(axis=0, ddof=1) / b.shape[0]
    z = (ma - mb) / np.sqrt(va + vb + 1e-12)
    degenerate = ((va == 0) | (vb == 0)) & (ma != mb)
    return z, ~degenerate


def test_pt_vs_nee_perpixel_ztest():
    """Principled per-pixel gate (SURVEY §7 hard-part 4): pt and pt-direct
    estimate the same integral, so the per-pixel Welch z between 16-seed
    stacks must look like noise — no pixel exceeds |z| = 5 beyond the null
    rate. A localized bias (e.g. a sign-flipped NEE G-term in a few % of
    pixels) concentrates large |z| there and fails; the quadrant-mean check
    in test_pt_vs_nee_agree would miss it.

    The scene is the NEE scene with an ENLARGED lamp at 16x16: pure pt's
    per-pixel variance is dominated by the probability of cosine-sampled
    bounces hitting the lamp, so the z-test only has power when that solid
    angle is large and spp is high (empirically tuned: per-pixel rel. SE
    ~5%, giving a +50%-bias bug z of ~10).

    Falsifiability is demonstrated in-test: a +50% bias injected into ~5% of
    lit pixels makes the same gate fail.
    """
    big = (
        NEE_SCENE.replace(
            """[[mesh]]
name = "ball"
type = "sphere"
radius = 0.6""",
            """[[mesh]]
name = "ball"
type = "sphere"
radius = 0.6

[[mesh]]
name = "bigball"
type = "sphere"
radius = 1.6""",
        )
        .replace(
            """name = "lamp"
mesh = "ball\"""",
            """name = "lamp"
mesh = "bigball\"""",
        )
        .replace("resolution = [32, 32]", "resolution = [16, 16]")
    )

    def sc(integ, spp):
        return compile_scene(
            parse_config(
                big.replace("SPP", str(spp)).replace("INTEGRATOR", integ)
            )
        )

    fa = _films(sc("pt", 768), range(300, 316))
    fb = _films(sc("pt-direct", 256), range(400, 416))

    z, ok = _zmap(fa, fb)
    # Rare-event pixels (zero observed variance on one side) are untestable
    # by construction; with the big lamp there should be none.
    assert (~ok).mean() < 0.02, (~ok).mean()
    frac_bad = float((np.abs(z[ok]) > 5.0).mean())
    assert frac_bad < 0.008, frac_bad  # measured null: 0

    # Deliberate ~5%-of-pixels bug on lit pixels: the gate must catch it.
    lum = fb.mean(axis=(0, 3))
    lit = lum > np.median(lum[lum > 0])
    rng = np.random.default_rng(0)
    mask = (rng.random(lum.shape) < 0.1) & lit
    assert 4 <= mask.sum() <= 0.1 * lum.size
    fb_bug = fb.copy()
    fb_bug[:, mask] *= 1.5
    z_bug, ok_bug = _zmap(fa, fb_bug)
    frac_bug = float((np.abs(z_bug[ok_bug]) > 5.0).mean())
    assert frac_bug > 0.008, frac_bug  # measured: 0.0195


def test_no_direct_emitter_flag():
    """no-direct-emitter zeroes emission only at depth 0 (quirk #5): the
    lamp pixels go dark but indirect lighting stays."""
    base = parse_config(
        NEE_SCENE.replace("SPP", "64").replace("INTEGRATOR", "pt-direct")
    )
    c1 = compile_scene(base)
    r1 = render(c1, seed=6)
    cfg2 = dataclasses.replace(
        base, renderer=dataclasses.replace(base.renderer, no_direct_emitter=True)
    )
    c2 = compile_scene(cfg2)
    r2 = render(c2, seed=6)
    # Brightest pixels (the lamp) dim dramatically; scene stays lit.
    assert r1.film.max() > 5.0  # direct emitter visible
    assert r2.film.max() < r1.film.max() * 0.5
    assert r2.film.mean() > 0.005


def test_ibl_and_thin_lens(assets_dir):
    """IBL sky + thin-lens camera + the full material zoo renders finite,
    non-black output."""
    c = compile_scene(
        __import__("lumillyrender_tpu").load_config(assets_dir / "ibl-material.toml"),
        spp=4,
    )
    c.settings = dataclasses.replace(c.settings, width=48, height=36)
    r = render(c, seed=7)
    assert np.isfinite(r.film).all()
    assert r.film.mean() > 0.01
    assert r.film.max() < 1e4


def test_omnidirectional_camera(assets_dir):
    c = compile_scene(
        __import__("lumillyrender_tpu").load_config(assets_dir / "vr.toml"), spp=4
    )
    c.settings = dataclasses.replace(c.settings, width=48, height=24)
    r = render(c, seed=8)
    assert np.isfinite(r.film).all()
    assert r.film.mean() > 0.001


def test_compaction_overflow_is_unbiased(monkeypatch):
    """Force pop-RR capacity OVERFLOW (stage width << live lanes) and verify
    the population-control reweighting stays unbiased: the compacted
    estimator's mean over many independent seeds must agree with the
    uncompacted estimator within the combined MC standard error.

    This exercises the scale = alive/width > 1 branch of `_compact`, which
    `test_compaction_matches_plain` (no overflow, exact parity) never hits.
    """
    from lumillyrender_tpu.integrator import wavefront

    # High-albedo CLOSED enclosure (camera sits inside the shell sphere) so
    # nearly every path is still alive at the forced compaction cut.
    shell = """
[[object]]
mesh = "shell"
material = "white"

[[mesh]]
name = "shell"
type = "sphere"
radius = 50
"""
    cfg = parse_config(
        NEE_SCENE.replace("SPP", "16")
        .replace("INTEGRATOR", "pt-direct")
        .replace("albedo = [0.8, 0.8, 0.8]", "albedo = [0.9, 0.9, 0.9]")
        .replace("resolution = [32, 32]", "resolution = [16, 16]")
        + shell
    )
    c = compile_scene(cfg)

    means_plain, means_comp = [], []
    seeds = range(40)

    # Uncompacted oracle.
    c_off = dataclasses.replace(
        c, settings=dataclasses.replace(c.settings, compaction="off")
    )
    for s in seeds:
        means_plain.append(float(render(c_off, seed=100 + s).film.mean()))

    # Tiny stage width from bounce 2 on: 16*16*16 = 4096 lanes compact into
    # 256 slots; most paths are alive at bounce 2, so alive/width ~ 10.
    n_lanes = 16 * 16 * 16
    forced = ((n_lanes, 0, 2), (256, 2, c.settings.max_bounces))
    monkeypatch.setattr(wavefront, "_stage_plan",
                    lambda n, s, **kw: forced)

    # Falsifiability guard: ONE eager (unjitted) trace with a spying
    # _compact proves the alive population actually exceeds the forced
    # width (concrete arrays reach the spy only outside jit).
    overflowed = []
    orig_compact = wavefront._compact

    def spy_compact(state, width, seed, ctr, salt=None):
        import jax.numpy as jnp

        overflowed.append(
            float(jnp.sum(state.alive.astype(jnp.float32))) > width
        )
        return orig_compact(state, width, seed, ctr, salt=salt)

    monkeypatch.setattr(wavefront, "_compact", spy_compact)
    from lumillyrender_tpu.integrator.render import render_chunk_impl

    render_chunk_impl(c.data, c.settings, 100, 0, spp_chunk=16)
    assert any(overflowed), "test never hit the overflow branch"
    monkeypatch.setattr(wavefront, "_compact", orig_compact)

    for s in seeds:
        means_comp.append(float(render(c, seed=100 + s).film.mean()))
    mp, mc = np.array(means_plain), np.array(means_comp)
    se = np.sqrt(mp.var() / len(mp) + mc.var() / len(mc))
    z = abs(mp.mean() - mc.mean()) / se
    assert z < 4.0, (mp.mean(), mc.mean(), z)


def test_compaction_matches_plain():
    """pop-rr staged compaction must reproduce the plain masked loop
    exactly when capacities don't overflow (same RNG streams per lane)."""
    c = nee_scene("pt-direct", 8)
    r_plain = render(
        dataclasses.replace(c, settings=dataclasses.replace(c.settings, compaction="off")),
        seed=9,
    )
    r_comp = render(c, seed=9)
    assert np.abs(r_plain.film - r_comp.film).max() < 1e-4


def test_tiled_lane_order_white_furnace_exact():
    """At 32-divisible resolutions camera lanes are issued TILE-ordered
    (packet coherence for the BVH kernels). The lane->pixel relabeling must
    not disturb the estimator: the white furnace identity stays exact."""
    from lumillyrender_tpu.integrator import render as render_mod

    c = furnace_scene(1.0)
    c.settings = dataclasses.replace(c.settings, width=64, height=64)
    assert render_mod.tile_decode(c.settings) is not None
    r = render(c, seed=5)
    assert np.abs(r.film - 1.0).max() < 1e-3


def test_tiled_matches_raster_statistically(monkeypatch):
    """Tiled vs raster lane order are different RNG-stream labelings of the
    same estimator: per-image means must agree within MC standard error."""
    from lumillyrender_tpu.integrator import render as render_mod

    cfg = parse_config(
        NEE_SCENE.replace("SPP", "16")
        .replace("INTEGRATOR", "pt-direct")
        .replace("resolution = [32, 32]", "resolution = [64, 64]")
    )
    c = compile_scene(cfg)
    assert render_mod.tile_decode(c.settings) is not None

    means_t, means_r = [], []
    for s in range(12):
        means_t.append(float(render(c, seed=50 + s).film.mean()))
    monkeypatch.setattr(render_mod, "tile_decode", lambda s: None)
    for s in range(12):
        means_r.append(float(render(c, seed=150 + s).film.mean()))
    t, r = np.array(means_t), np.array(means_r)
    se = np.sqrt(t.var() / len(t) + r.var() / len(r))
    z = abs(t.mean() - r.mean()) / max(se, 1e-12)
    assert z < 4.0, (t.mean(), r.mean(), z)


def test_many_light_searchsorted_matches_dense(assets_dir, monkeypatch):
    """The n_lights > DENSE_MAX NEE pick path (searchsorted fallback,
    wavefront._sample_light_point) must agree EXACTLY with the dense
    one-hot path used for small light tables — the emissive-mesh case
    (every emissive triangle its own light prim, `objects.rs:19-23`) is
    precisely where an indexing bug would otherwise ship silently."""
    import jax.numpy as jnp

    from lumillyrender_tpu.integrator import wavefront
    from lumillyrender_tpu.ops import table
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    c = compile_scene_file(assets_dir / "many-light.toml", spp=1)
    scene = c.data
    n_lights = int(scene.lights.prim.shape[0])
    assert n_lights > table.DENSE_MAX, (
        f"scene must exceed DENSE_MAX={table.DENSE_MAX}; got {n_lights}"
    )

    rng = np.random.default_rng(7)
    n = 4096
    u_pick = jnp.asarray(rng.random(n, dtype=np.float32))
    u1 = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random(n, dtype=np.float32))

    # Default: n_lights (256) > DENSE_MAX (192) -> searchsorted branch.
    p_ss, pdf_ss = wavefront._sample_light_point(scene, u_pick, u1, u2)
    # Forced-dense oracle: both branches see identical inputs.
    monkeypatch.setattr(table, "DENSE_MAX", n_lights + 8)
    p_d, pdf_d = wavefront._sample_light_point(scene, u_pick, u1, u2)

    assert np.abs(np.asarray(p_ss) - np.asarray(p_d)).max() < 1e-6
    assert np.abs(np.asarray(pdf_ss) - np.asarray(pdf_d)).max() == 0.0

    # The pick is area-proportional over ALL prims: samples must land across
    # the whole light set, not clip at the DENSE_MAX boundary.
    d2 = np.asarray(p_ss) - np.array([0.0, 3.2, 0.0])
    r = np.linalg.norm(d2, axis=1)
    assert np.all(np.abs(r - 0.6) < 0.08)  # on the (faceted) lamp sphere
    # Both hemispheres of the lamp get picked (prims are latitude-ordered).
    assert (d2[:, 1] > 0.3).any() and (d2[:, 1] < -0.3).any()


def test_many_light_pt_vs_nee_agree(assets_dir):
    """End-to-end cross-estimator gate THROUGH the searchsorted NEE branch:
    pt (never picks lights) and pt-direct (picks among 256 light prims)
    estimate the same image; their means must agree within MC error."""
    import dataclasses as dc

    from lumillyrender_tpu.scene.compiler import compile_scene_file

    def sc(integ, spp):
        c = compile_scene_file(assets_dir / "many-light.toml", spp=spp)
        c.settings = dc.replace(c.settings, width=32, height=32,
                                integrator=integ)
        return c

    a = render(sc("pt", 768), seed=21).film.mean(axis=2)
    b = render(sc("pt-direct", 192), seed=22).film.mean(axis=2)
    assert a.mean() > 0.01
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.1, (a.mean(), b.mean())
    h, w = a.shape
    for sy in (slice(0, h // 2), slice(h // 2, h)):
        for sx in (slice(0, w // 2), slice(w // 2, w)):
            qa, qb = a[sy, sx].mean(), b[sy, sx].mean()
            assert abs(qa - qb) / max(qa, 1e-9) < 0.2, (qa, qb)
