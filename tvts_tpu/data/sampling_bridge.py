"""Thin re-export so the data layer depends on one sampling implementation."""

from tvts_tpu.ops.sampling import multi_clip_frame_indices, sample_frames  # noqa: F401
