"""video_mamba_suite_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-Mamba framework.

A from-scratch rebuild of the capabilities of OpenGVLab/video-mamba-suite
(reference layout documented in /root/repo/SURVEY.md), designed TPU-first:

- ``ops``      selective-scan / causal-conv primitives (pure-jnp reference
               implementations + Pallas TPU kernels with custom VJPs)
- ``models``   Mamba mixers (ViM bidirectional-v2, DBM, scan-norm, causal),
               Block, MixerModel/LM head, ViViM + TimeMamba video backbones
- ``parallel`` mesh construction, sharded training step, sequence-parallel
               ring scan over a mesh axis
- ``tasks``    the seven task suites (TAL, TAS, dense captioning, VTG,
               anticipation, egocentric CLIP, action recognition)
- ``utils``    config, optimizers, schedules, EMA, checkpointing, metrics
- ``data``     feature readers and host-side video decode pipelines
"""

__version__ = "0.1.0"
