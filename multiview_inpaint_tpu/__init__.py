"""multiview_inpaint_tpu — TPU-native generative object insertion for 3DGS.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference "Generative Object Insertion in Gaussian Splatting with a
Multi-View Diffusion Model" pipeline (see SURVEY.md):

- ``gs``        — 3D Gaussian Splatting scene core (params, PLY I/O, cameras,
                  COLMAP, OBB, densification, scenes).
- ``ops``       — TPU compute kernels (differentiable splat rasterizer with
                  depth, KNN init, attention).
- ``diffusion`` — multi-view (video) diffusion stack: VideoUNet, ControlNet,
                  VAE, conditioners, EDM denoisers/samplers/guiders, losses.
- ``models``    — assembled model families (GS trainers, SVD inpainting
                  engine, SDS guidance).
- ``parallel``  — device mesh / sharding rules / distributed train steps.
- ``pipelines`` — stage CLIs mirroring the reference entry points.
- ``metrics``   — CLIP similarity, PSNR/SSIM, image-quality metrics.
"""

__version__ = "0.1.0"
