"""tpurt — a TPU-native (JAX/XLA/Pallas) physically-based renderer.

From-scratch rebuild of the capabilities of the PBRT-v3 fork
``tux550/RayTracer-RPF`` (reference at /root/reference): full pbrt scene
parsing and scene-description API, a wavefront path tracer, and the fork's
Random Parameter Filtering (RPF) denoiser — redesigned TPU-first rather than
ported.  Host-side Python owns parsing / scene build / BVH build; the device
owns ray generation, BVH traversal, shading, light sampling, film scatter and
the dense RPF filtering pass, all as batched JAX/Pallas kernels over SoA
buffers.

Layer map (mirrors SURVEY.md §7):
  tpurt.scene     tokenizer, parser, paramset, api state machine, factories
  tpurt.geom      transforms, mesh flattening, host BVH build
  tpurt.sampling  low-discrepancy math, PCG32, halton/sobol/... samplers
  tpurt.render    cameras, film, filters, lights, BSDFs, integrators
  tpurt.rpf       sample buffer, mutual information, joint bilateral filter
  tpurt.kernels   Pallas TPU kernels (with pure-JAX fallbacks)
  tpurt.parallel  device-mesh sharding of the render (shard_map)
  tpurt.io        EXR/PFM/PNG image IO
"""

__version__ = "0.1.0"
