"""jointimagegeneration_tpu — TPU-native two-stage text→CT generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
OvO1111/JointImageGeneration ("GuideGen"): a categorical-diffusion volumetric
organ-mask sampler (stage 1) feeding an autoregressive slice-wise Gaussian
diffusion CT image generator (stage 2), plus the surrounding framework
(training engines, VAE/GAN first stage, text conditioning, data pipelines,
distributed execution over TPU meshes).

Design stance (not a port):
  * channels-last layouts everywhere (TPU lane dim = trailing 128)
  * diffusion samplers are single `lax.scan` programs, compiled once
  * the categorical posterior contraction is evaluated in closed form in
    O(C) per voxel instead of the reference's O(C^2) einsum with a
    [B,C,C,D,H,W] intermediate (ccdm/ddpm/models/diffusion_denoising.py:105-139)
  * parallelism is mesh + NamedSharding; gradient sync is an XLA psum,
    not a DDP wrapper
"""

__version__ = "0.1.0"
