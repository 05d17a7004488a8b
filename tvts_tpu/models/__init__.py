from tvts_tpu.models.configs import (
    SortConfig,
    TextConfig,
    TVTSv2Config,
    VisionConfig,
    tvtsv2_b_16,
    tvtsv2_b_32,
    tvtsv2_h_14,
)
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.models.sort import SortTransformer
from tvts_tpu.models.text import TextTransformer
from tvts_tpu.models.tvts_v2 import TVTSv2
