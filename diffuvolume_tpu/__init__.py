"""DiffuVolume-TPU: a TPU-native stereo-matching framework with diffusion cost-volume filtering.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iSEE-Laboratory/DiffuVolume (IJCV 2025): plug-and-play diffusion filtering of 4D
cost volumes for stereo matching, with ACVNet / PCWNet / IGEV-Stereo backbones.

Unlike the reference (three copy-forked PyTorch sub-projects, nn.DataParallel),
this package is a single framework:

- ``ops``:       pure jit/shard-friendly numeric kernels (cost volumes, soft-argmin,
                 samplers) with Pallas TPU kernels for the hot paths.
- ``diffusion``: ONE implementation of the diffusion volume filter (cosine schedule,
                 q_sample, DDIM with renewal filtering + step ensembles) shared by
                 all backbones.
- ``models``:    flax.linen backbones exposing a uniform build_volume / aggregate /
                 predict interface so the diffusion wrapper composes generically.
- ``parallel``:  jax.sharding Mesh helpers; data/volume-axis sharding over ICI.
- ``data``:      dataset readers (PFM/PNG), augmentation, input pipelines.
- ``train``:     pjit train steps, losses, LR schedules, Orbax checkpointing.
- ``eval``:      metrics (EPE/D1/Thres) and the two-model inference pipeline.
"""

__version__ = "0.1.0"
