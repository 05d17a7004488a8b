"""PyTorch checkpoint -> Flax param tree conversion.

Handles the two checkpoint sources the reference framework consumes:
1. Released TVTS/TVTSv2 training checkpoints — `.pth` dicts whose `state_dict` maps
   module paths of the TVTSv2_* classes (video_model.*, text_model.resblocks.*,
   text_token_embedding.*, pred_model.*), optionally `module.`-prefixed from DDP
   (reference utils/util.py:25-51, `state_dict_data_parallel_fix`).
2. Raw CLIP / OpenCLIP tower weights used as pretrain init — the reference remaps
   `in_proj_* -> qkv.*` and `out_proj -> proj` before a strict=False load into the
   video tower (model_dist_TVTSv2_ViT_B_16.py:33-45); `convert_clip_visual` mirrors
   that, leaving the new parameters (timeattn, ln_3, temporal_embedding, sort head)
   at their fresh init.

No torch import is required: pass any mapping of key -> numpy array (use
`load_torch_state_dict` when torch is available).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def strip_ddp_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_SKIP = ("attn_mask", "num_batches_tracked", "logit_scale")

# plain nn.Parameter tensors that map through unchanged (no .weight/.bias suffix)
_DIRECT_PARAMS = {
    "class_embedding", "positional_embedding", "temporal_embedding", "proj",
    "text_projection", "type_embed", "gamma",
    "cls_token", "pos_embed", "temporal_embed",  # v1 JointViT
    "query", "qkv_bias",  # AttentionalPooler
}


def _convert_key(key: str, arr: np.ndarray):
    """One torch key -> (flax path tuple, converted array), or None to skip."""
    if any(s in key for s in _SKIP):
        return None

    parts = key.split(".")

    # ---- top-level renames into the TVTSv2 flax layout ----
    flat = key
    flat = re.sub(r"^text_token_embedding\.weight$", "text_model.token_embedding.weight", flat)
    flat = re.sub(r"^text_positional_embedding$", "text_model.positional_embedding", flat)
    flat = re.sub(r"^text_ln_final\.", "text_model.ln_final.", flat)
    flat = re.sub(r"^text_projection$", "text_model.text_projection", flat)
    flat = re.sub(r"^text_model\.resblocks\.(\d+)\.", r"text_model.blocks_\1.", flat)
    flat = re.sub(r"\.transformer\.resblocks\.(\d+)\.", r".blocks_\1.", flat)
    flat = re.sub(r"^pred_model\.blocks\.(\d+)\.", r"pred_model.blocks_\1.", flat)
    # sort head MLP uses fc1/fc2 names (sort_transformer.py:21-23)
    flat = re.sub(r"\.mlp\.fc1\.", ".mlp.c_fc.", flat)
    flat = re.sub(r"\.mlp\.fc2\.", ".mlp.c_proj.", flat)
    # AttentionalPooler (separate q/k/v projections, H_14.py:184-207) —
    # must precede the generic fused-MHA rules below
    flat = re.sub(r"\.attn_pool\.attn\.([qkv])_proj_weight$",
                  r".attn_pool.\1_proj.weight", flat)
    flat = re.sub(r"\.attn_pool\.attn\.in_proj_bias$",
                  r".attn_pool.qkv_bias", flat)
    flat = re.sub(r"\.attn_pool\.attn\.out_proj\.", r".attn_pool.proj.", flat)
    # torch MultiheadAttention fused projections (text towers)
    flat = flat.replace(".attn.in_proj_weight", ".attn.qkv.weight")
    flat = flat.replace(".attn.in_proj_bias", ".attn.qkv.bias")
    flat = flat.replace(".attn.out_proj.", ".attn.proj.")

    parts = flat.split(".")
    leaf = parts[-1]

    if leaf == "weight":
        owner = parts[-2]
        if arr.ndim == 5:  # Conv3d tubelet: [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
            return tuple(parts[:-1]) + ("kernel",), arr.transpose(2, 3, 4, 1, 0)
        if arr.ndim == 4:  # conv patchify: [out, in, kh, kw] -> [kh, kw, in, out]
            return tuple(parts[:-1]) + ("kernel",), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:
            if owner == "token_embedding":
                return tuple(parts[:-1]) + ("embedding",), arr
            return tuple(parts[:-1]) + ("kernel",), arr.T
        if arr.ndim == 1:  # LayerNorm weight
            return tuple(parts[:-1]) + ("scale",), arr
        raise ValueError(f"unhandled weight shape {arr.shape} for {key}")
    if leaf == "bias":
        return tuple(parts[:-1]) + ("bias",), arr
    if leaf in _DIRECT_PARAMS:
        if leaf == "type_embed":
            return tuple(parts), arr
        return tuple(parts), arr
    raise ValueError(f"unhandled key {key}")


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Full TVTSv2 (or component) torch state_dict -> nested flax param dict."""
    sd = strip_ddp_prefix(sd)
    tree: dict = {}
    for k, v in sd.items():
        out = _convert_key(k, np.asarray(v))
        if out is None:
            continue
        path, arr = out
        _set(tree, path, arr)
    return tree


def convert_v1_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """TVTS v1 checkpoint (model_dist_TVTS.py module paths) -> flax params for
    models.tvts_v1.TVTSv1. Handles the HF DistilBERT subtree, the Conv3d tubelet
    patchify, per-tube JointViT params, and the Sequential projection heads
    (txt_proj.1 / vid_proj.0)."""
    from tvts_tpu.models.distilbert import convert_distilbert_state_dict

    sd = dict(strip_ddp_prefix(sd))
    # VideoMAE-style attention biases: qkv Linear is bias-free with separate
    # q_bias/v_bias params and an implicit zero k bias (modeling_finetune.py:68-86)
    for k in [k for k in sd if k.endswith(".attn.q_bias")]:
        base = k[: -len("q_bias")]
        qb = np.asarray(sd.pop(k))
        vb = np.asarray(sd.pop(base + "v_bias"))
        sd[base + "qkv.bias"] = np.concatenate([qb, np.zeros_like(qb), vb])

    tree: dict = {}
    text_sd = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.startswith("text_model."):
            text_sd[k[len("text_model."):]] = v
            continue
        if k.startswith("txt_proj.1."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            _set(tree, ("txt_proj", leaf), v.T if leaf == "kernel" else v)
            continue
        if k.startswith("vid_proj.0."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            _set(tree, ("vid_proj", leaf), v.T if leaf == "kernel" else v)
            continue
        if k.startswith("video_model."):
            k2 = re.sub(r"^video_model\.blocks\.(\d+)\.", r"video_model.blocks_\1.", k)
            k2 = k2.replace("patch_embed.proj.", "patch_embed.")
            out = _convert_key(k2, v)
            if out is not None:
                _set(tree, *out)
            continue
        out = _convert_key(k, v)
        if out is not None:
            _set(tree, *out)
    if text_sd:
        tree["text_model"] = convert_distilbert_state_dict(text_sd)
    return tree


def inflate_mae_2d_to_3d(sd: Mapping[str, np.ndarray],
                         tubelet_size: int = 2) -> dict[str, np.ndarray]:
    """MAE IN-1K 2D patch-embed -> tubelet Conv3d inflation (reference
    model_dist_TVTS.py:56-59: unsqueeze(2).repeat over the time kernel dim)."""
    out = dict(sd)
    key = "patch_embed.proj.weight"
    if key in out and np.asarray(out[key]).ndim == 4:
        w = np.asarray(out[key])  # [D, 3, p, p]
        out[key] = np.repeat(w[:, :, None], tubelet_size, axis=2)
    return out


def convert_clip_visual(visual_sd: Mapping[str, np.ndarray]) -> dict:
    """Raw CLIP `visual.*` state_dict -> partial video-tower params.

    Mirrors the reference remap (model_dist_TVTSv2_ViT_B_16.py:33-45):
    in_proj_* -> qkv.*, out_proj -> proj; the space-time-only params (timeattn,
    ln_3, temporal_embedding) are absent and must come from fresh init.
    """
    remapped = {}
    for k, v in visual_sd.items():
        k = re.sub(r"^visual\.", "", k)
        k = k.replace("in_proj_", "qkv.")
        k = k.replace("out_proj", "proj")
        remapped[f"video_model.{k}"] = v
    return convert_state_dict(remapped)


def convert_clip_full(sd: Mapping[str, np.ndarray]) -> dict:
    """Raw OpenAI-CLIP state_dict (visual.* + text params at top level) ->
    partial TVTSv2 flax params: visual tower via `convert_clip_visual`, text
    tower via the standard map. Space-time-only params are absent (fresh init),
    matching the reference's strict=False CLIP load (model_dist_*.py:33-45)."""
    visual = {k: v for k, v in sd.items() if k.startswith("visual.")}
    text = {}
    for k, v in sd.items():
        if k.startswith("visual.") or k.startswith("logit_scale"):
            continue
        if k.startswith("transformer."):
            text[f"text_model.{k}"] = v  # .transformer.resblocks.N -> blocks_N
        elif k == "text_projection":
            text[k] = v
        else:  # token_embedding.weight / positional_embedding / ln_final.*
            text[f"text_{k}"] = v
    tree = convert_clip_visual(visual)
    text_tree = convert_state_dict(text)
    for key, sub in text_tree.items():
        tree[key] = sub
    return tree


def merge_params(init_params: dict, loaded: dict, strict: bool = False) -> dict:
    """Overlay `loaded` onto `init_params` (fresh init fills anything missing).

    With strict=True, raises if `loaded` contains a path absent from init or with a
    mismatched shape.
    """
    import jax

    flat_init = dict(_flatten(init_params))
    flat_loaded = dict(_flatten(loaded))
    unused = []
    for path, arr in flat_loaded.items():
        if path not in flat_init:
            unused.append(path)
            continue
        if tuple(flat_init[path].shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"init {flat_init[path].shape} vs loaded {arr.shape}")
        flat_init[path] = np.asarray(arr, dtype=np.asarray(flat_init[path]).dtype)
    if strict and unused:
        raise ValueError(f"unused loaded params: {['/'.join(p) for p in unused]}")
    tree: dict = {}
    for path, arr in flat_init.items():
        _set(tree, path, arr)
    return jax.tree.map(lambda x: x, tree)


def _flatten(tree: dict, prefix: tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


# ---------------------------------------------------------------------------
# Flax -> torch EXPORT (the inverse bridge): emits a state_dict the
# reference's own loaders accept, so a TPU-trained model can be validated on
# GPUs with zero code from this repo. Counterparts:
#   - `module.`-prefix handling: /root/reference/v2/utils/util.py:25-51
#     (state_dict_data_parallel_fix strips/adds it either way)
#   - checkpoint dict format: /root/reference/v2/base/base_trainer.py:165-189
#   - downstream subtree extraction (`module.video_model.*`):
#     /root/reference/v1/downstream/run_class_finetuning.py:336-341
# ---------------------------------------------------------------------------

# flat-name renames, applied in order AFTER leaf conversion (inverse of the
# `_convert_key` renames; scoped so tower-local naming quirks don't leak:
# only the CLIP/OpenCLIP text towers use fused nn.MultiheadAttention, only
# the sort head names its MLP fc1/fc2)
_EXPORT_RENAMES = (
    (r"^text_model\.token_embedding\.weight$", "text_token_embedding.weight"),
    (r"^text_model\.positional_embedding$", "text_positional_embedding"),
    (r"^text_model\.ln_final\.", "text_ln_final."),
    (r"^text_model\.text_projection$", "text_projection"),
    (r"^text_model\.blocks_(\d+)\.", r"text_model.resblocks.\1."),
    (r"^video_model\.blocks_(\d+)\.", r"video_model.transformer.resblocks.\1."),
    (r"^pred_model\.blocks_(\d+)\.", r"pred_model.blocks.\1."),
    (r"^(pred_model\..*)\.mlp\.c_fc\.", r"\1.mlp.fc1."),
    (r"^(pred_model\..*)\.mlp\.c_proj\.", r"\1.mlp.fc2."),
    (r"^(text_model\..*)\.attn\.qkv\.weight$", r"\1.attn.in_proj_weight"),
    (r"^(text_model\..*)\.attn\.qkv\.bias$", r"\1.attn.in_proj_bias"),
    (r"^(text_model\..*)\.attn\.proj\.", r"\1.attn.out_proj."),
    # H/14 AttentionalPooler (separate q/k/v MultiheadAttention)
    (r"\.attn_pool\.([qkv])_proj\.weight$", r".attn_pool.attn.\1_proj_weight"),
    (r"\.attn_pool\.qkv_bias$", ".attn_pool.attn.in_proj_bias"),
    (r"\.attn_pool\.proj\.", ".attn_pool.attn.out_proj."),
)


def export_state_dict(params: dict, ddp_prefix: bool = True
                      ) -> dict[str, np.ndarray]:
    """Flax TVTSv2 param tree -> torch state_dict (numpy values, float32).

    Inverse of `convert_state_dict`: kernels transpose back ([in,out] ->
    [out,in]; convs to [out,in,(kt,)kh,kw]), LayerNorm scale -> weight,
    embeddings -> .weight, the text towers' qkv -> in_proj_*. With
    ``ddp_prefix`` keys are `module.`-prefixed like the reference's own
    DDP-trained checkpoints (its loader strips the prefix when needed).
    Deterministic buffers the torch modules rebuild in __init__ (attn_mask)
    are not parameters and are not emitted."""
    out: dict[str, np.ndarray] = {}
    for path, arr in _flatten(params):
        arr = np.asarray(arr)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        leaf = path[-1]
        if leaf == "kernel":
            if arr.ndim == 5:    # [kt,kh,kw,in,out] -> [out,in,kt,kh,kw]
                arr = arr.transpose(4, 3, 0, 1, 2)
            elif arr.ndim == 4:  # [kh,kw,in,out] -> [out,in,kh,kw]
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:
                arr = arr.T
            name = ".".join(path[:-1]) + ".weight"
        elif leaf in ("scale", "embedding"):
            name = ".".join(path[:-1]) + ".weight"
        else:  # bias and direct nn.Parameter leaves keep their names
            name = ".".join(path)
        for pat, repl in _EXPORT_RENAMES:
            name = re.sub(pat, repl, name)
        if ddp_prefix:
            name = "module." + name
        out[name] = arr
    return out


def save_reference_checkpoint(params: dict, path: str, arch: str,
                              epoch: int = 0, config: dict | None = None,
                              monitor_best: float = 0.0):
    """Write a `.pth` in the reference trainer's checkpoint format
    (base_trainer.py:165-189): {'arch', 'epoch', 'state_dict' (DDP-prefixed),
    'optimizer' (empty), 'monitor_best', 'config'} — loadable by the
    reference's _resume_checkpoint / downstream eval scripts."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in export_state_dict(params).items()}
    torch.save({"arch": arch, "epoch": epoch, "state_dict": sd,
                "optimizer": {}, "monitor_best": monitor_best,
                "config": config or {}}, path)
