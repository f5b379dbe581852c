"""streetunveiler_tpu — TPU-native semantic-aware 2D Gaussian surfel splatting.

A brand-new JAX/XLA/Pallas framework with the capabilities of
DavidXu-JJ/StreetUnveiler (ICLR 2025): street-scene reconstruction as
semantically-labeled 2D Gaussian surfels, instance selection/removal, and
inpainting-guided re-optimization ("unveiling") — redesigned TPU-first.

Layer map (see SURVEY.md for the reference analysis this build follows):

    ops/        pure-jnp math + Pallas kernels (rasterizer, SH, hash grid, KNN)
    models/     surfel pytree state, delta re-optimization model, sky model
    scene/      cameras, dataset readers, COLMAP I/O, point clouds
    parallel/   device mesh, tile-parallel sharding of the rasterizer
    train/      losses, LR schedules, the jitted train step, training loop
    pipeline/   unveiling stages: selection, mask generation, re-optimization
    utils/      semantics taxonomy, PLY I/O, disjoint set, misc
"""

__version__ = "0.1.0"
