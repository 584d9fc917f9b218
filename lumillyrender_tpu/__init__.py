"""LumillyRender-TPU: a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CPU renderer `pnlybubbles/LumillyRender` (Rust): TOML scene
descriptions, .obj meshes + analytic spheres, SAH BVH, five BSDFs, four
camera models, uniform/IBL skies, png/hdr output — redesigned as a
wavefront renderer over SoA queues, differentiable end to end, and sharded
across TPU meshes with `pjit`/`shard_map`.
"""

from .scene.compiler import CompiledScene, compile_scene, compile_scene_file
from .scene.loader import Config, load_config, parse_config
from .integrator.render import RenderResult, render

__version__ = "0.1.0"

__all__ = [
    "CompiledScene",
    "Config",
    "RenderResult",
    "compile_scene",
    "compile_scene_file",
    "load_config",
    "parse_config",
    "render",
]
