#!/bin/bash
# One-shot TPU measurement sweep for a round: runs every driver/bench tool
# and leaves the committed artifacts refreshed. Each step is independently
# timed out; failures don't abort the rest (artifacts record what ran).
set -x
cd "$(dirname "$0")/.."

run() { name=$1; shift; timeout "$@" 2>&1 | tail -40 > "/tmp/runbook_$name.log"; echo "== $name rc=$?"; }

run bench        3600 python bench.py
run roofline     3600 python tools/roofline_achieved.py --json roofline_achieved.json
run pallas       3600 python tools/bench_pallas.py
run bigmesh      5400 python tools/bench_bigmesh.py --tris 1000000
run crossover    5400 python tools/sweep_crossover.py --shape blob --json sweep_crossover.json
run tileorder    3600 python tools/probe_tile_order.py
run detail       7200 python tools/bench_detail.py
run fused        3600 python tools/bench_fused.py
run bwd          3600 python tools/bench_bwd.py
run brutekern    3600 python tools/bench_brute_vs_kernel.py
echo "runbook done"

# --- Mosaic/Pallas findings bank (established empirically, round 4) -----
# * No uint32<->f32 casts in Mosaic kernels: run RNG in int32 (wrapping
#   mul/add/xor identical; logical >> = arithmetic >> + mask).
# * Bool tiles cannot be materialized (i8<->i1 trunc errors): carry flags
#   as f32 0/1, never jnp.where into a stored bool, no bool.astype().
# * Output block sublane dims must be 8-divisible: (1,128) rejected; use
#   an (8,128) cross-grid accumulator (same block every grid step,
#   init at program_id==0).
# * f32 matmul on the MXU defaults to bf16 (rel err ~1e0 at scene
#   scales!); precision=jax.lax.Precision.HIGHEST restores ~f32 quality.
#   3D dot_general (R,16)x(16,SUB,LANE) lowers fine. BUT: a
#   Pluecker-form MXU triangle intersector measured 0% faster than the
#   unrolled VPU Moeller-Trumbore at 2M lanes (perfect winner agreement,
#   t rel 8e-5) — the fused kernels are not MT-compute-bound.
# * jit(grad(scan(custom_vjp))) fails with "no constant handler for
#   DynamicJaxprTracer" when the custom_vjp takes PYTREE-dataclass args
#   or closes over ANY traced value (even non-differentiated jit-arg
#   tracers). Flat jnp-array signatures with every traced value an
#   explicit argument (the ops/pallas_bvh.py pattern) lower fine.
# * The failing structure is specifically pytree-dataclass args /
#   closed-over tracers on the custom_vjp, NOT lax.cond per se: the
#   shipped diff path wraps the flat-signature fused step in lax.cond
#   inside scan (wavefront.run_stage) and compiles fine on hardware
#   (BWD_REMAT.json fused-hand-vjp, 90.8 M rays/s).
# * Fused-kernel tile sweep (flagship, 20-chunk steady state):
#   SUB=8 289, 16 316, 32 330, 64 329, 128 322 M rays/s.
# --- round-5 additions ---
# * jnp.searchsorted at wavefront widths lowers to log2(n) SERIAL
#   per-lane gather rounds: the gather-only rank inversion in _compact
#   measured 20x slower end-to-end than the 1-column scatter (597 -> 44 M
#   rays/s). Scatters are slow; serial gather chains are slower.
# * LLR_REORDER=1 on the RESIDENT packet path: welcome-geo 29 -> 1.8 M.
#   Reordering only pays on the streamed path it was built for.
# * int32 // and % by a NON-pow2 compile-time constant lower fine in
#   Mosaic (ray-gen general pixel decode) — pow2 still prefers masks.
# * jax.experimental.topologies.get_topology_desc(platform='tpu',
#   topology_name='v5e:2x4') works here: AOT-compile multi-chip programs
#   (and read their optimized HLO schedules) without hardware.
# * jax.profiler.ProfileData parses xplane.pb directly — per-op device
#   times without tensorboard (tools/trace_bwd.py, trace_render.py).
# * Cold-tunnel single measurements can read 3-8x low (CLIFF 128-tri row:
#   0.97 vs 13.96 M on re-measure); never conclude from one cold run,
#   and keep heavy CPU jobs (oracle gate) off the host during benches.
# --- round-5 continuation (wide-leaf kernel) ---
# * Lane-inverted BVH kernel (ops/pallas_bvh_wide.py): rays on SUBLANES,
#   128-tri leaves on LANES. New lowering facts (tools/probe_wide.py):
#   dynamic-sublane (1,128)/(9,128) VECTOR block loads lower; (8,8)
#   narrow out blocks lower; (8,128)->(128,8) swapaxes lowers, enabling
#   "transpose row data into a column, then dynamic-sublane SCALAR reads"
#   - the trick behind the per-chunk precull.
# * Per-iteration cost of a Mosaic while_loop walk is ~70-120 cycles
#   regardless of body slimness (scalar reads + branch latency + loop
#   machinery): the wide kernel is WALK-bound, not leaf-bound. Numpy
#   union-walk sim (1M tris): ~20-30 node visits/ray at ANY packet size
#   8-64 (t-pruning keeps unions tight), leaves/ray ~3 constant.
# * Fully-batched chunk traversal (slab 128 preorder nodes at once,
#   drain only desc-flagged leaves; exact by box-nesting: desc(leaf)
#   already implies every ancestor desc) is algorithmically sound but
#   every control-flow shape tried for the leaf drain FAILED:
#   - leaf_test (ref writes) inside fori nested in while: XLA-CPU
#     interpret hangs at execution; TPU worker faults.
#   - flattened single while with two pl.when branches + SMEM-carried
#     (exit, pending): TPU worker faults even with every dynamic index
#     clamped; identical code ONCE ran and then faulted on re-runs -
#     flaky, smells like a Mosaic codegen race, not program logic.
#   - nested dynamic-read while chase for the chunk exit: faults.
#   Each ingredient probed fine in isolation (/tmp-era probes now in
#   tools/probe_wide.py + this bank); the combination is what breaks.
#   Shipped shape instead: v1 "precull" - per-node scalar walk over a
#   transposed [desc|miss|leaf] column, leaf_test under pl.when directly
#   in the single while body (the packet kernel's proven shape).
# * WIDE_SWEEP.json (1M-tri terrain, 256k rays): precull kernel
#   WSUB=64: 0.53 M rays/s coherent / 0.41 sorted-incoherent vs the
#   streamed packet kernel's 0.49/0.24. Monotone in WSUB 8->64.
