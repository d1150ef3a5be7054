"""svgf_tpu — a TPU-native real-time path tracing + SVGF denoising framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/OpenGL SVGF renderer (jacquespillet/SVGF): a hybrid 1spp path tracer with
a G-buffer primary-visibility pass, spatiotemporal variance-guided filtering
(Schied et al. 2017), TAA, scene/BVH management, and multi-chip image-space
parallelism — differentiable end-to-end.

Layer map (reference -> here):
  L1 device memory/interop   -> jax.Array + donation (XLA manages memory)
  L2 scene model & asset IO  -> svgf_tpu.core  (+ svgf_tpu.io loaders)
  L3 acceleration structures -> svgf_tpu.accel (host build, device traversal)
  L4 device kernels          -> svgf_tpu.ops / svgf_tpu.render / svgf_tpu.kernels
  L5 orchestrator            -> svgf_tpu.render.pipeline.Renderer
  L6 GUI                     -> offline drivers + debug taps (svgf_tpu.utils)
  parallelism (new)          -> svgf_tpu.parallel (mesh/sharding/halo exchange)
"""

__version__ = "0.1.0"

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig, SamplingMode, DebugOutput

__all__ = [
    "RenderConfig",
    "SVGFConfig",
    "TracingConfig",
    "SamplingMode",
    "DebugOutput",
]
