from tvts_tpu.ops.sampling import sample_frames
from tvts_tpu.ops.masking import make_tube_keep_indices, gather_tube_tokens
from tvts_tpu.ops.sim import sim_matrix
from tvts_tpu.ops.losses import norm_softmax_loss, sort_loss
