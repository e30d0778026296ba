"""zest-tpu: a TPU-native (JAX/XLA/Pallas) framework for generalizable dynamic
novel-view synthesis with the full capabilities of ZeST-NeRF (BMVC 2023).

Structure
---------
- ``zest_tpu.config``    — typed config + configargparse-compatible CLI front-end
- ``zest_tpu.geometry``  — rays, NDC, pose math (pure jnp)
- ``zest_tpu.sampling``  — pixel/ray/depth sampling strategies
- ``zest_tpu.ops``       — grid sampling, homography plane-sweep warp (XLA + Pallas)
- ``zest_tpu.models``    — NeRF fields, MVS encoder (FeatureNet/CostRegNet), discriminators
- ``zest_tpu.render``    — volume rendering core (static + dynamic scene-flow paths)
- ``zest_tpu.losses``    — full loss suite (photometric, scene-flow, regularizers, GAN)
- ``zest_tpu.system``    — training system: jitted train/eval steps, optimizer, state
- ``zest_tpu.parallel``  — device mesh + ray-batch sharding over ICI
- ``zest_tpu.data``      — host-side dataset loaders (NSFF/LLFF/DTU/Neural3DVideo)
"""

__version__ = "0.1.0"
