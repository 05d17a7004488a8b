from tvts_tpu.data.loader import ShardedLoader
from tvts_tpu.data.transforms import video_transform
from tvts_tpu.data.video_reader import get_video_len, read_frames_sampled
