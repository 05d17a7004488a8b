"""tvts_tpu — a TPU-native video-text contrastive pretraining + zero-shot eval framework.

Rebuilds the capabilities of TencentARC/TVTS (TVTS v1, CVPR'23 + TVTSv2 tech report '23)
as an idiomatic JAX/XLA/Pallas/pjit framework:

- divided space-time attention video ViTs (B/32, B/16, H/14) with tube masking
- CLIP / OpenCLIP-compatible text towers (checkpoint-parity parameterization)
- transcript-sorting head + InfoNCE contrastive training with all-gathered negatives
- SPMD training over `jax.sharding.Mesh` (dp / fsdp / tp axes)
- host-side video decode pipeline (C++/FFmpeg with OpenCV fallback)
- zero-shot retrieval / recognition / multiple-choice eval harness

The public surface mirrors the reference framework's entry points
(train_dist_*, zero_ret_*, zero_recognition_*, zero_ssv2_mc_*, feature_extraction_*)
while the internals are TPU-first.
"""

__version__ = "0.1.0"
