"""Model construction + parameter initialization / checkpoint loading."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models.configs import MODEL_REGISTRY, TVTSv2Config
from tvts_tpu.models.tvts_v2 import TVTSv2


def init_params(model: TVTSv2, cfg: TVTSv2Config, seed: int = 0) -> dict:
    v = cfg.vision
    video = jnp.zeros((1, v.num_frames, 3, v.input_resolution, v.input_resolution),
                      jnp.float32)
    keep = jnp.arange(v.n_keep, dtype=jnp.int32)[None]
    ids = np.zeros((cfg.num_clips, cfg.text.context_length), np.int32)
    ids[:, 0] = cfg.text.vocab_size - 2
    ids[:, 1] = cfg.text.vocab_size - 1
    return model.init(jax.random.PRNGKey(seed), video, jnp.asarray(ids), keep)["params"]


def build_model(arch_type: str,
                load_checkpoint: str | None = None,
                eval_mode: bool = True,
                dtype=jnp.float32,
                remat: bool = False,
                strict: bool = True,
                use_pallas: bool = False):
    """(cfg, model, params). `load_checkpoint` may be a torch .pth, an .npz export,
    or an orbax directory."""
    cfg = MODEL_REGISTRY[arch_type]()
    if eval_mode:
        cfg = cfg.eval_config()
    model = TVTSv2(cfg, dtype=dtype, remat=remat, use_pallas=use_pallas)
    params = init_params(model, cfg)

    if load_checkpoint:
        from tvts_tpu.utils import checkpoint as ckpt
        from tvts_tpu.utils.torch_convert import merge_params

        if load_checkpoint.endswith((".pth", ".pt", ".bin")):
            params = ckpt.load_params_from_torch(load_checkpoint, params,
                                                 strict=strict)
        elif load_checkpoint.endswith(".npz"):
            params = merge_params(params, ckpt.load_params_npz(load_checkpoint),
                                  strict=strict)
        elif os.path.isdir(load_checkpoint):
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(load_checkpoint), target=params)
            params = restored
        else:
            raise ValueError(f"unknown checkpoint format: {load_checkpoint}")
    return cfg, model, params
