"""Wavefront path-tracing integrators (`pt` and `pt-direct`).

TPU-native replacement for the reference's per-pixel recursion
(`scene.rs:20-46,64-193`): the whole wavefront (lane = pixel x sample)
advances together through an iterative bounce loop — intersect-all,
shade/NEE, sample-next — with Russian-roulette deaths handled by masking.
Forward rendering uses `lax.while_loop` (stops as soon as every lane dies);
the differentiable path uses a fixed-length `lax.scan` (reverse-mode safe).

Estimator parity, bounce by bounce (`scene.rs:173-193`):
  accum += T * l_e                      (front-face, depth-0 rules)
  T /= rr_prob                          (survivors only)
  accum += T * direct_light             (pt-direct only)
  T *= brdf * coef * cos / pdf          (`scene.rs:78-102`)
with sky radiance added for missed rays at every depth (`scene.rs:43`),
regardless of the NEE no-emission flag.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPS, INF, PI
from ..ops import bsdf, rng, sky as sky_ops, table, vec
from ..ops.intersect import intersect, intersect_shade, shade_point
from ..scene.data import RenderSettings, SceneData

# RNG purpose slots per bounce (ctr = bounce * _SLOTS + slot). One pcg4d
# evaluation serves four draws, so the bounce step needs exactly TWO mixer
# calls: _SCATTER -> (rr, lobe phi, lobe radius, refraction roulette) and
# _NEE -> (light pick, point-on-light u, v).
_SLOTS = 8
_SCATTER = 0
_NEE = 1


class PathState(NamedTuple):
    bounce: jax.Array  # () int32
    o: jax.Array  # (N, 3)
    d: jax.Array  # (N, 3)
    throughput: jax.Array  # (N, 3)
    accum: jax.Array  # (N, 3)
    alive: jax.Array  # (N,) bool
    rays_traced: jax.Array  # () int64-ish counter (float32 to stay cheap)
    lane: jax.Array  # (N,) uint32 original lane id (RNG stream + pixel id)


def _russian_roulette(weight, bounce, settings: RenderSettings):
    """`scene.rs:64-76`: prob = weight; halved per depth past depth_limit;
    forced to 1 while depth <= depth (if positive)."""
    prob = weight
    over = jnp.maximum(bounce - settings.depth_limit, 0).astype(prob.dtype)
    prob = prob * jnp.power(0.5, over)
    prob = jnp.where((bounce <= settings.depth) & (prob > 0.0), 1.0, prob)
    return prob


def _sample_light_point(scene: SceneData, u_pick, u1, u2):
    """Area-proportional light pick + uniform point (`objects.rs:37-51`,
    `triangle.rs:140-149`, `sphere.rs:79-84`). pdf = 1 / total_area.

    All emitter geometry comes from the light-local table (tiny), selected
    by dense one-hot rows — no gather into the global prim tables."""
    lights = scene.lights
    roulette = lights.total_area * u_pick
    n_lights = lights.prim.shape[0]
    if n_lights <= table.DENSE_MAX:
        # searchsorted(left) == count of cdf entries strictly below roulette;
        # the dense count keeps N on vector lanes (cdf is tiny).
        li = jnp.sum(
            (lights.cdf[:, None] < roulette[None, :]).astype(jnp.int32), axis=0
        )
    else:
        # Emissive meshes make every emissive triangle its own light prim, so
        # L can reach the thousands; the dense (L, N) matrix would be O(L*N)
        # compute and memory per bounce. Log-time searchsorted instead (the
        # light-local take_rows below falls back to jnp.take at the same
        # threshold).
        li = jnp.searchsorted(lights.cdf, roulette, side="left").astype(jnp.int32)
    li = jnp.clip(li, 0, n_lights - 1)

    is_tri = table.take_rows(lights.is_tri, li) > 0
    # Triangle sample: min/max trick (`triangle.rs:140-149`).
    p0 = table.take_rows(lights.p0, li)
    le1 = table.take_rows(lights.e1, li)
    le2 = table.take_rows(lights.e2, li)
    mn = jnp.minimum(u1, u2)[..., None]
    mx = jnp.maximum(u1, u2)[..., None]
    p_tri = p0 * mn + (p0 + le1) * (1.0 - mx) + (p0 + le2) * (mx - mn)
    # Sphere sample: uniform over the FULL sphere (quirk #10).
    c = table.take_rows(lights.c, li)
    r = table.take_rows(lights.r, li)
    phi = 2.0 * PI * u1
    z = u2 * 2.0 - 1.0
    zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    dir_s = jnp.stack([jnp.cos(phi) * zs, jnp.sin(phi) * zs, z], axis=-1)
    p_sph = c + dir_s * r[..., None]

    point = jnp.where(is_tri[..., None], p_tri, p_sph)
    pdf = jnp.full(u1.shape, 1.0, u1.dtype) / lights.total_area
    return point, pdf


def _direct_light(scene, settings, sp, out_dir, mats_eval, mats_gathered, lane, seed, bounce_ctr):
    """NEE contribution (`scene.rs:104-151`). Returns (N,3) radiance.

    `mats_eval` is the (possibly differentiable) material table used for
    BRDF evaluation; gathers for sampling decisions already happened in
    `mats_gathered`.
    """
    u_pick, u1, u2, _ = rng.uniform4(seed, lane, bounce_ctr + _NEE)
    light_point, pdf = _sample_light_point(scene, u_pick, u1, u2)
    light_point, pdf = _name_samp(light_point, pdf)

    path = light_point - sp.position
    dist = vec.norm(path)
    wi = path / jnp.maximum(dist, 1e-20)[..., None]

    point_normal = vec.orienting_normal(out_dir, sp.normal)
    cos_p = vec.dot(wi, point_normal)
    ok = cos_p > 0.0

    # Emissive-hit early-out (`scene.rs:105-108`): no NEE from emitters.
    not_emitter = vec.sqr_norm(mats_gathered.emission) <= 0.0
    ok = ok & not_emitter

    # Capped shadow query: anything at t >= dist + 2*EPS can't change the
    # visibility verdict (`scene.rs:127-131` needs |t - dist| <= EPS), so
    # the traversal prunes every subtree beyond the light. The cap carries
    # one extra EPS of slack because `t < dist + EPS` under f32 rounding is
    # NOT equivalent to `t - dist <= EPS` — a tight cap dropped boundary
    # hits that the reference's comparison accepts.
    shadow, shadow_sp = intersect_shade(
        sp.position, wi, scene.geometry, scene.bvh, settings.intersector,
        t_cap=dist + 2.0 * EPS, occlusion=True,
    )
    shadow, shadow_sp = _name_isect(shadow, shadow_sp)
    visible = shadow_sp.hit & (jnp.abs(shadow.t - dist) <= EPS)
    ok = ok & visible

    light_cos = vec.dot(-wi, shadow_sp.normal)
    ok = ok & (light_cos > 0.0)

    g = cos_p * light_cos / jnp.maximum(vec.sqr_norm(path), 1e-20)
    # Evaluation table may carry gradients; same rows as the sampling table.
    f = bsdf.eval_brdf(
        bsdf.gather(mats_eval, sp.mat), out_dir, wi, point_normal,
        sp.position, present=settings.mat_types,
    )
    l_e = bsdf.gather(mats_eval, shadow_sp.mat).emission
    contrib = f * l_e * (g / pdf)[..., None]
    return jnp.where(ok[..., None], contrib, 0.0)


def _name_samp(*vals):
    """Mark detached SAMPLING outputs (BSDF lobe direction/pdf, point on
    light) as checkpoint-saveable residuals under the "samp" name.

    Sampling decisions are computed from the stop-gradient table, so no
    cotangent ever flows through them — rematerializing their ONB +
    transcendental math in the backward sweep is pure waste. Saving them
    costs ~4-8 f32/lane/bounce of HBM. No-op outside jax.checkpoint.
    """
    from jax.ad_checkpoint import checkpoint_name

    out = tuple(checkpoint_name(v, "samp") for v in vals)
    return out if len(out) > 1 else out[0]


def _name_isect(hit, sp):
    """Mark intersection outputs as checkpoint-saveable residuals.

    The differentiable path rematerializes each bounce in the backward
    pass; with these names saved (`ISECT_POLICY`), the recompute reuses
    the forward's traversal results instead of re-walking the scene — the
    single most expensive piece of the bounce — at ~16 f32/lane/bounce of
    HBM. No-op outside jax.checkpoint (the forward renderer).
    """
    from jax.ad_checkpoint import checkpoint_name

    nm = lambda x: checkpoint_name(x, "isect")
    from ..ops.intersect import Hit, ShadePoint

    return (
        Hit(t=nm(hit.t), prim=nm(hit.prim)),
        ShadePoint(
            position=nm(sp.position), normal=nm(sp.normal),
            mat=nm(sp.mat), hit=nm(sp.hit),
        ),
    )


def make_bounce_step(scene: SceneData, settings: RenderSettings, seed,
                     mats_eval=None, allow_fused: bool = True):
    """Build the per-bounce transition function over PathState.

    `mats_eval` defaults to `scene.materials`; the differentiable renderer
    passes the live (gradient-carrying) table here while `scene.materials`
    holds a detached copy used for sampling decisions.

    Forward rendering on TPU uses the FUSED Pallas bounce kernel when the
    scene qualifies (ops/pallas_bounce.py: brute-force regime, uniform sky,
    small light/material tables) — the whole transition below runs inside
    one Pallas program with zero layout/bookkeeping work. The XLA step
    built here is its correctness oracle (tests/test_fused_bounce.py) and
    serves the differentiable path (`allow_fused=False`), big scenes, IBL
    and many-light scenes.
    """
    if mats_eval is None and allow_fused:
        from ..ops import pallas_bounce

        if pallas_bounce.enabled(scene, settings):
            return pallas_bounce.make_step(
                scene, settings, seed, interpret=not pallas_bounce.on_tpu()
            )
        if pallas_bounce.enabled_bvh(scene, settings):
            # Resident-BVH scenes: packet walk + shading + NEE fused in
            # one Pallas program (ops/pallas_bounce.make_step_bvh).
            return pallas_bounce.make_step_bvh(
                scene, settings, seed, interpret=not pallas_bounce.on_tpu()
            )
    if mats_eval is not None and allow_fused:
        # Differentiable path: Lambert-only scenes get the fused forward
        # kernel with a HAND-WRITTEN Pallas backward (custom_vjp) — no
        # rematerialized XLA bounce anywhere (ops/pallas_bounce.py,
        # `supported_diff`). Other fused-eligible material mixes get the
        # HYBRID step: fused Pallas forward + structured-XLA backward
        # (one recompute per bounce — what bwd_remat='full' pays anyway,
        # minus the expensive XLA forward sweep). run_stage detects
        # `.fused_diff` and skips jax.checkpoint (both custom VJPs'
        # residuals are just the carry).
        from ..ops import pallas_bounce

        if pallas_bounce.enabled_diff(scene, settings):
            return pallas_bounce.make_step_diff(
                scene, settings, seed, mats_eval,
                interpret=not pallas_bounce.on_tpu(),
            )
        if pallas_bounce.enabled_diff_hybrid(scene, settings):
            return pallas_bounce.make_step_diff_hybrid(
                scene, settings, seed, mats_eval,
                interpret=not pallas_bounce.on_tpu(),
            )
    if mats_eval is None:
        mats_eval = scene.materials
    nee = settings.integrator == "pt-direct"

    def step(state: PathState) -> PathState:
        bounce = state.bounce
        lane = state.lane
        ctr = bounce * _SLOTS

        hit, sp = intersect_shade(
            state.o, state.d, scene.geometry, scene.bvh, settings.intersector
        )
        hit, sp = _name_isect(hit, sp)
        rays = state.rays_traced + jnp.sum(state.alive.astype(jnp.float32))

        # Sky on miss (`scene.rs:43`) — at every depth, both integrators.
        missed = state.alive & ~sp.hit
        sky_l = sky_ops.radiance(scene.sky, settings.sky_kind, state.d)
        accum = state.accum + jnp.where(
            missed[..., None], state.throughput * sky_l, 0.0
        )
        alive = state.alive & sp.hit

        m_sample = bsdf.gather(scene.materials, sp.mat)
        m_eval = bsdf.gather(mats_eval, sp.mat)
        out_dir = -state.d

        # Emission (`scene.rs:175-179`): front faces only; depth-0 gated by
        # no-direct-emitter; NEE kills it past depth 0 (no MIS, quirk #3).
        front = vec.dot(out_dir, sp.normal) > 0.0
        if nee:
            allow_e = (bounce == 0) & (not settings.no_direct_emitter)
        else:
            allow_e = jnp.logical_or(
                bounce != 0, jnp.array(not settings.no_direct_emitter)
            )
        emit_mask = alive & front & allow_e
        accum = accum + jnp.where(
            emit_mask[..., None], state.throughput * m_eval.emission, 0.0
        )

        # One mixer call covers RR + all three BSDF-sampling draws.
        u_rr, r1, r2, r3 = rng.uniform4(seed, lane, ctr + _SCATTER)

        # Russian roulette (`scene.rs:180-183`).
        prob = _russian_roulette(bsdf.rr_weight(m_sample), bounce, settings)
        cont = (prob == 1.0) | (u_rr < prob)
        alive = alive & cont
        throughput = state.throughput / jnp.maximum(prob, 1e-12)[..., None]

        # NEE (`scene.rs:185-186`).
        if nee and settings.has_lights:
            direct = _direct_light(
                scene, settings, sp, out_dir, mats_eval, m_sample, lane, seed, ctr
            )
            accum = accum + jnp.where(alive[..., None], throughput * direct, 0.0)
            rays = rays + jnp.sum(alive.astype(jnp.float32))  # shadow rays

        # BSDF sampling + throughput update (`scene.rs:78-102`).
        s = bsdf.sample(m_sample, out_dir, sp.normal, r1, r2, r3,
                        present=settings.mat_types)
        s = bsdf.BsdfSample(*_name_samp(s.direction, s.pdf))
        f = bsdf.eval_brdf(m_eval, out_dir, s.direction, sp.normal,
                           sp.position, present=settings.mat_types)
        cf = bsdf.coef(m_eval, out_dir, sp.normal, hit.t,
                       present=settings.mat_types)
        cos = vec.dot(s.direction, sp.normal)  # geometric n (`scene.rs:91`)
        w = f * cf * (cos / jnp.where(s.pdf != 0.0, s.pdf, 1.0))[..., None]
        throughput = throughput * jnp.where(alive[..., None], w, 1.0)
        # Lanes whose weight collapsed to exactly zero can never contribute.
        alive = alive & jnp.any(w != 0.0, axis=-1) & (s.pdf != 0.0)

        return PathState(
            bounce=bounce + 1,
            o=jnp.where(alive[..., None], sp.position, state.o),
            d=jnp.where(alive[..., None], s.direction, state.d),
            throughput=jnp.where(alive[..., None], throughput, state.throughput),
            accum=accum,
            alive=alive,
            rays_traced=rays,
            lane=lane,
        )

    return step


def trace(scene: SceneData, settings: RenderSettings, o, d, lane, seed,
          differentiable: bool = False, mats_eval=None):
    """Trace radiance for a wavefront of rays. Returns (radiance (N,3),
    rays_traced ())."""
    n = o.shape[0]
    state = PathState(
        bounce=jnp.int32(0),
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), o.dtype),
        accum=jnp.zeros((n, 3), o.dtype),
        alive=jnp.ones((n,), bool),
        rays_traced=jnp.float32(0.0),
        lane=jnp.asarray(lane, jnp.uint32),
    )
    step = make_bounce_step(scene, settings, seed, mats_eval=mats_eval,
                            allow_fused=not differentiable)

    if differentiable:
        # Rematerialize each bounce in the backward pass: reverse-mode over
        # the raw scan saves every intersection temp of every bounce (tens
        # of GB at real wavefronts — OOMs a 16 GB chip at 256^2 x 4 spp);
        # with jax.checkpoint only the (small) PathState carry is saved per
        # bounce and the bounce is recomputed when its cotangent arrives.
        # Classic compute-for-HBM trade; the recompute is one extra forward.
        ck_step = jax.checkpoint(step)

        def scan_step(s, _):
            return ck_step(s), None

        state, _ = jax.lax.scan(scan_step, state, None, length=settings.max_bounces)
    else:
        state = jax.lax.while_loop(
            lambda s: jnp.any(s.alive) & (s.bounce < settings.max_bounces),
            step,
            state,
        )
    return state.accum, state.rays_traced


def aov(scene: SceneData, settings: RenderSettings, o, d):
    """Debug AOV integrators (`scene.rs:48-62`): "normal" maps the hit
    normal to [0,1]^3, "depth" returns the hit distance (0 on miss). Dead
    code in the reference (never dispatched from main.rs) — exposed here via
    the CLI --aov flag for capability parity."""
    hit = intersect(o, d, scene.geometry, scene.bvh, settings.intersector)
    sp = shade_point(o, d, hit, scene.geometry)
    if settings.integrator == "normal":
        val = sp.normal / 2.0 + 0.5
        return jnp.where(sp.hit[..., None], val, 0.0)
    t = jnp.where(sp.hit, hit.t, 0.0)
    return jnp.broadcast_to(t[..., None], t.shape + (3,))


# ---------------------------------------------------------------------------
# Staged wavefront compaction (SURVEY §7 hard-part #2)
# ---------------------------------------------------------------------------


def _stage_plan(n: int, settings: RenderSettings, aggressive: bool = False):
    """Static (width, first_bounce, last_bounce) stages.

    Widths shrink as Russian roulette kills paths. Two measured regimes
    (round 4, variance-vs-time sweep on TPU):

    * `aggressive` (brute/fused scenes): jump straight from full width to
      n/64 at depth+3 and 4096 at depth+14. This OVERFLOWS the live
      population at the first cut (~11% alive vs a 1.5% capacity), so
      population-control RR resamples ~7/8 of live lanes — measured
      pixel-variance cost on the flagship: +0.16% (deep paths carry
      ~0.4^k throughput) for -32% chunk time, a +46% efficiency win
      (1/(variance*time): 1.01e4 -> 1.47e4 at 128^2x32spp).
    * default (packet-traversal scenes): the round-3 occupancy-matched
      plan. Aggressive resampling SLOWED welcome-geo 2x: survivors
      scatter across the image, packets lose coherence, and the packet
      kernel's union-traversal cost explodes — worth more than the lane
      savings.
    """
    def cap(div):
        return max(4096, (n // div + 255) // 256 * 256)

    d = settings.depth
    mb = settings.max_bounces
    plan = []
    if aggressive:
        cuts = [
            (n, 0, min(d + 3, mb)),
            (cap(64), min(d + 3, mb), min(d + 14, mb)),
            (4096, min(d + 14, mb), mb),
        ]
    else:
        cuts = [
            (n, 0, min(d + 3, mb)),
            (cap(8), min(d + 3, mb), min(d + 9, mb)),
            (cap(64), min(d + 9, mb), min(d + 19, mb)),
            (4096, min(d + 19, mb), mb),
        ]
    for w, b0, b1 in cuts:
        if b1 > b0:
            plan.append((min(w, n), b0, b1))
    return tuple(plan)


def _compact(state: PathState, width: int, seed, ctr: int,
             salt=None) -> PathState:
    """Shrink the wavefront to `width` slots.

    When the live population fits (a <= width): prefix compaction keeps
    every live lane (exact, weight 1). On overflow: SYSTEMATIC resampling —
    exactly `width` of the `a` live lanes are kept via a jittered-grid rank
    pick (one scalar uniform u; ranks ceil((j+u)*a/width), j=0..width-1),
    each live lane kept with marginal probability width/a, and survivors
    reweighted by a/width — population-control Russian roulette, unbiased.

    This replaces the previous argsort-based random-subset selection: a full
    sort of the wavefront keys costs orders of magnitude more than the two
    cumsums + scatter/gather used here (XLA sort at 2M lanes dominated the
    stage-boundary cost on TPU), and systematic resampling additionally
    stratifies the survivors across the (pixel-ordered) lane axis.
    """
    n = state.alive.shape[0]
    # Exact integer ranks: s[i] = number of live lanes in [0..i] (<= 2^24,
    # exact in int32); live lanes carry distinct ranks 1..a.
    s = jnp.cumsum(state.alive.astype(jnp.int32))
    a = s[-1]
    af = a.astype(jnp.float32)

    # Everything is GATHER-formulated: TPU scatter measured ~7x slower than
    # gather at wavefront widths (223 vs 30 ms at 2M lanes), so the only
    # scatter here is the 1-column rank->index inversion. Slot 0 absorbs
    # dead lanes' writes (unused: live ranks start at 1). A round-5
    # experiment replaced this with jnp.searchsorted(s, r) — gather-only,
    # and 20x SLOWER end-to-end (flagship 597 -> 44 M rays/s): the binary
    # search lowers to log2(n) serial per-lane gather rounds, each costing
    # ~3x the scatter. Keep the scatter.
    rank_pos = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(state.alive, s, 0)
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")

    overflow = a > width
    j = jnp.arange(width, dtype=jnp.int32)
    # No overflow: slot j <- the (j+1)-th live lane (prefix compaction).
    # Overflow: slot j <- the ceil((j+u)*a/width)-th live lane (systematic
    # resampling; marginal keep prob width/a, exactly width survivors).
    # The grid jitter u is salted with the chunk's FIRST camera lane id
    # (`salt`, threaded from trace_film before any resampling ran) —
    # globally unique per chunk AND per device shard, and independent of
    # the current alive pattern, which systematic resampling's
    # unbiasedness argument requires. Reading post-compaction lane[0]
    # instead (the old behavior, kept as fallback for direct callers)
    # would make u a function of the live set at stages 2+.
    if salt is None:
        salt = state.lane[0]
    u = rng.uniform(seed, jnp.asarray(salt, jnp.uint32)
                    ^ jnp.uint32(0x5EED5EED), ctr)
    g = (j.astype(jnp.float32) + u) * (af / jnp.float32(width))
    r_over = jnp.ceil(g).astype(jnp.int32)
    r = jnp.where(overflow, r_over, j + 1)
    r = jnp.clip(r, 1, jnp.maximum(a, 1))
    src = rank_pos[r]

    take = lambda arr: jnp.take(arr, src, axis=0)
    alive = jnp.where(overflow, jnp.bool_(True), j < a) & (a > 0)
    scale = jnp.maximum(af / jnp.float32(width), 1.0)
    return PathState(
        bounce=state.bounce,
        o=take(state.o),
        d=take(state.d),
        throughput=take(state.throughput) * scale,
        accum=jnp.zeros((width, 3), state.accum.dtype),
        alive=alive,
        rays_traced=state.rays_traced,
        lane=take(state.lane),
    )


def trace_film(scene: SceneData, settings: RenderSettings, o, d, lane, seed,
               weight0, n_pixels: int, differentiable: bool = False,
               mats_eval=None, lanes_ordered: bool = True, pixel_fn=None):
    """Trace a wavefront and accumulate directly into a flat pixel buffer.

    `weight0` (N,) is the camera estimator weight (g * sensitivity / pdf),
    folded into the initial throughput so per-lane radiance never needs to
    be materialized. Returns (film_flat (n_pixels, 3) SUM over lanes, rays).

    With settings.compaction == "pop-rr" the wavefront shrinks at staged
    bounce depths: contributions are banked into the film at every stage
    boundary, live lanes are compacted (prefix scatter; systematic-
    resampling population control on overflow — unbiased), and the next
    stage runs at the smaller width.

    `differentiable=True` (the inverse-rendering path) swaps each stage's
    early-exit `while_loop` for a fixed-length `lax.scan`. With compaction
    (pop-rr) the step runs unconditionally — occupancy-matched stages keep
    lanes live, and the round-5 trace showed the all-dead `lax.cond` skip
    cost ~2 ms/bounce in carry copies at 4M lanes while almost never
    firing. Without compaction the cond skip remains (long dead tails),
    and the per-bounce body is `jax.checkpoint`-ed per settings.bwd_remat.
    Compaction applies identically in both sweeps: the backward pass also
    runs at the shrunken widths, which is what closes most of the
    fwd-vs-fwd+bwd throughput gap (a full-width 80-bounce scan did ~6x the
    useful work).

    `lanes_ordered` declares that lane ids arrived in arange order (true
    for both render drivers), letting the FIRST bank be a reshape-sum
    reduction instead of a wavefront-sized scatter-add.

    `pixel_fn(lane) -> pixel index` overrides the default `lane % n_pixels`
    mapping — the drivers pass the tile decode when camera lanes are issued
    tile-ordered (integrator/render.py:tile_decode).
    """
    n = o.shape[0]
    lane = jnp.asarray(lane, jnp.uint32)
    state = PathState(
        bounce=jnp.int32(0),
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), o.dtype) * weight0[..., None],
        accum=jnp.zeros((n, 3), o.dtype),
        alive=jnp.ones((n,), bool),
        rays_traced=jnp.float32(0.0),
        lane=lane,
    )
    step = make_bounce_step(scene, settings, seed, mats_eval=mats_eval,
                            allow_fused=not differentiable)
    film = jnp.zeros((n_pixels, 3), o.dtype)

    def to_pixel(lane_vals):
        if pixel_fn is not None:
            return pixel_fn(lane_vals).astype(jnp.int32)
        return (lane_vals % jnp.uint32(n_pixels)).astype(jnp.int32)

    def bank(film, st: PathState, ordered: bool = False):
        if ordered and st.accum.shape[0] % n_pixels == 0:
            by_lane = st.accum.reshape(-1, n_pixels, 3).sum(axis=0)
            if pixel_fn is None:
                return film + by_lane
            # Tiled lane order: one n_pixels-sized permuted scatter-add.
            perm = to_pixel(jnp.arange(n_pixels, dtype=jnp.uint32))
            return film.at[perm].add(by_lane)
        return film.at[to_pixel(st.lane)].add(st.accum)

    def run_stage(state, b1: int, n_steps: int):
        if differentiable:
            if settings.compaction == "pop-rr":
                # Occupancy-matched stages keep most lanes live for the
                # whole stage, so the all-dead cond-skip almost never
                # fires while its carry copies cost ~2 ms/bounce at 4M
                # lanes (tools/trace_bwd.py: cond glue was 17 of the
                # 41 ms stage-0 while). Run the (mask-correct) step
                # unconditionally.
                def scan_step(s, _):
                    return step(s), None
            else:
                def scan_step(s, _):
                    s2 = jax.lax.cond(
                        jnp.any(s.alive) & (s.bounce < b1), step,
                        lambda x: x, s
                    )
                    return s2, None

            # Per-bounce rematerialization policy (settings.bwd_remat),
            # measured on the 256^2 x 4 spp train step (BWD_REMAT.json,
            # tools/bench_bwd.py):
            #   "full"       plain jax.checkpoint (save carries only) —
            #                one recompute per bounce in the backward;
            #   "isect"      save named intersection outputs (the round-3
            #                policy — now measured SLOWER than "full":
            #                the residual traffic costs more than the
            #                recompute it avoids at these widths);
            #   "isect+samp" additionally save detached sampling outputs;
            #   "none"       no remat: reverse-mode saves every bounce
            #                intermediate (HBM-bound at wide stages);
            #   "hybrid"     no remat on narrow stages (width <= 48k,
            #                where full residuals are cheap), "full"
            #                checkpoint on wide ones.
            mode = getattr(settings, "bwd_remat", "full")
            if mode not in ("none", "full", "hybrid", "isect",
                            "isect+samp"):
                raise ValueError(
                    f"unknown bwd_remat policy {mode!r}; expected one of "
                    "'none', 'full', 'hybrid', 'isect', 'isect+samp'"
                )
            if getattr(step, "fused_diff", False):
                # custom_vjp bounce: its residuals are just the input carry
                # (saved by the scan anyway) and its backward is one Pallas
                # kernel pass — jax.checkpoint would only add a pointless
                # forward re-run.
                mode = "none"
            width = state.alive.shape[0]
            if mode == "none" or (mode == "hybrid" and width <= 48 * 1024):
                state, _ = jax.lax.scan(scan_step, state, None,
                                        length=n_steps)
                return state
            if mode in ("full", "hybrid"):
                ck = jax.checkpoint(scan_step)
            else:
                names = ("isect",) if mode == "isect" else ("isect", "samp")
                ck = jax.checkpoint(
                    scan_step,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *names
                    ),
                )
            state, _ = jax.lax.scan(ck, state, None, length=n_steps)
            return state
        return jax.lax.while_loop(
            lambda s: jnp.any(s.alive) & (s.bounce < b1), step, state
        )

    if settings.compaction != "pop-rr":
        state = run_stage(state, settings.max_bounces, settings.max_bounces)
        return bank(film, state, ordered=lanes_ordered), state.rays_traced

    from ..ops.intersect import _use_brute

    first = True
    # Aggressive resampling is a forward-renderer tradeoff (variance
    # +0.16% for -32% time at 2M-lane chunks). The differentiable path's
    # smaller wavefronts measured slightly WORSE under it (93.0 vs 95.4 M
    # rays/s fwd+bwd) and keep the occupancy-matched ladder.
    plan = _stage_plan(
        n, settings,
        aggressive=(not differentiable
                    and _use_brute(scene.geometry, settings.intersector,
                                   scene.bvh)),
    )
    for si, (width, b0, b1) in enumerate(plan):
        if width != state.alive.shape[0]:
            film = bank(film, state, ordered=lanes_ordered and first)
            first = False
            state = _compact(state, width, seed, 0x50000000 + si,
                             salt=lane[0])
        state = run_stage(state, b1, b1 - b0)
    film = bank(film, state, ordered=lanes_ordered and first)
    return film, state.rays_traced
