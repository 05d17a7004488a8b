"""Hand-scheduled inference forward for SpaceTimeViT using the fused
space-attention megakernel (ops/pallas_block_attention.py).

Consumes the STANDARD SpaceTimeViT param tree (checkpoint-compatible), so it is
a drop-in fast path for feature extraction / zero-shot eval: the time sub-path
and MLP run as XLA (where XLA's fusion already wins), while the space sub-path —
the largest single cost after time attention (PERF.md ablation) — runs as one
Pallas call per block with LN+qkv+attention+proj fused in VMEM.

Forward-only; both pooling styles (openai B/32, B/16 and openclip H/14).
Training uses model.apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.ops.attention import divided_space_time_attention, merge_heads, split_heads
from tvts_tpu.ops.masking import gather_tube_tokens
from tvts_tpu.ops.pallas_block_attention import (
    fused_mlp_block,
    fused_space_attention_block,
    fused_space_attention_block_v2,
    fused_space_attention_block_v5,
    fused_time_attention_block,
    fused_time_attention_block_v2,
    fused_time_attention_block_v4,
)


def _layernorm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _var_attention_xla(x, p, T, N, mode, num_heads):
    D = x.shape[-1]
    d = D // num_heads
    qkv = x @ p["qkv"]["kernel"].astype(x.dtype) + p["qkv"]["bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = split_heads(q * (d ** -0.5), num_heads)
    k = split_heads(k, num_heads)
    v = split_heads(v, num_heads)
    out = merge_heads(divided_space_time_attention(q, k, v, T, N, mode))
    return out @ p["proj"]["kernel"].astype(x.dtype) + p["proj"]["bias"].astype(x.dtype)


def _mlp(x, p, act):
    h = x @ p["c_fc"]["kernel"].astype(x.dtype) + p["c_fc"]["bias"].astype(x.dtype)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    return h @ p["c_proj"]["kernel"].astype(x.dtype) + p["c_proj"]["bias"].astype(x.dtype)


def space_time_vit_fused_forward(params: dict, cfg: VisionConfig,
                                 video: jnp.ndarray,
                                 keep_ind: jnp.ndarray | None = None,
                                 dtype=jnp.bfloat16,
                                 fuse_time: bool = True,
                                 fuse_mlp: bool = True,
                                 kernel_version: int = 2,
                                 time_chunk: int = 128,
                                 space_version: int = 2,
                                 space_fpp: int | None = None,
                                 mlp_chunk: int = 256,
                                 need_tokens: bool = True,
                                 scan_blocks: bool = False,
                                 mm_group: int | None = None,
                                 mlp_group: int | None = None,
                                 interpret: bool = False):
    """Equivalent to SpaceTimeViT(cfg, dtype).apply({'params': params}, ...).
    Returns (pooled, tokens) per the config's pool_style; with
    need_tokens=False the tokens output is None and the full-token ln_post
    projection is skipped (extraction consumes the CLS embedding only).
    scan_blocks=True (kernel_version 7/8 only) runs the depth loop as a
    lax.scan over stacked per-block weights, so each sub-path kernel is
    traced/compiled ONCE instead of cfg.layers times — much smaller MLIR and
    far faster remote compiles, identical math."""
    x, T = _embed_stem(params, cfg, video, keep_ind, dtype)
    n_keep = (x.shape[1] - 1) // T
    if kernel_version in (7, 8):
        # d-major tower: activations stay [B, T, D, N] across all sub-path
        # kernels (the v3/v4 per-program transposes paid once at tower
        # entry/exit; PERF.md round-3 d-major section). v8 = v7 with the
        # space+MLP sub-paths fused into one kernel (one fewer [B,T,D,N]
        # HBM round-trip per block).
        from tvts_tpu.ops.pallas_block_attention import (
            fused_mlp_block_v7,
            fused_space_attention_block_v7,
            fused_spacemlp_block_v7,
            fused_time_attention_block_v7,
        )

        B, D = x.shape[0], cfg.width
        cls = x[:, :1]
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, n_keep, D), -1, -2)
        tc = time_chunk if n_keep % time_chunk == 0 else n_keep
        # matmul frame-grouping (PERF r4): lane-concat g frames per qkv/proj
        # (time) and fc/proj (MLP) matmul — g=3 cuts the N=196 lane pad from
        # 30.6% to 8.8% (53.6->49.5 / 66.9->57.1 ms per chain at B=32).
        # Auto only when the pad actually shrinks (e.g. NOT at N=256, which
        # is already tile-aligned — lane_pad_gain)
        from tvts_tpu.ops.pallas_block_attention import lane_pad_gain

        if mm_group is not None:
            mmg = mm_group
        else:
            mmg = 3 if T % 3 == 0 and lane_pad_gain(n_keep, 3) else 1
        if T % max(mmg, 1):
            mmg = 1
        # the MLP fc/proj grouping can differ from the time qkv/proj one
        # (different working-set sizes); defaults to mm_group
        mlpg = mlp_group if mlp_group is not None else mmg
        if T % max(mlpg, 1):
            mlpg = mmg
        if scan_blocks:
            names = (["ln_3.scale", "ln_3.bias", "timeattn.qkv.kernel",
                      "timeattn.qkv.bias", "timeattn.proj.kernel",
                      "timeattn.proj.bias", "ln_1.scale", "ln_1.bias",
                      "attn.qkv.kernel", "attn.qkv.bias", "attn.proj.kernel",
                      "attn.proj.bias", "ln_2.scale", "ln_2.bias",
                      "mlp.c_fc.kernel", "mlp.c_fc.bias",
                      "mlp.c_proj.kernel", "mlp.c_proj.bias"])

            def pick(i, name):
                node = params[f"blocks_{i}"]
                for k in name.split("."):
                    node = node[k]
                # LN params stay f32 (in-kernel fp32 LN); weights/biases bf16
                return node if name.startswith("ln_") else node.astype(dtype)

            stacked = [jnp.stack([pick(i, n) for i in range(cfg.layers)])
                       for n in names]

            def body(carry, bw):
                xT, cls = carry
                (ln3s, ln3b, twq, tbq, twp, tbp, ln1s, ln1b, swq, sbq, swp,
                 sbp, ln2s, ln2b, wfc, bfc, wpr, bpr) = bw
                trT, trc = fused_time_attention_block_v7(
                    xT, cls, ln3s, ln3b, twq, tbq, twp, tbp,
                    num_heads=cfg.heads, chunk=tc, mm_group=mmg,
                    interpret=interpret)
                if kernel_version == 8:
                    xT, cls = fused_spacemlp_block_v7(
                        trT, xT, trc, cls, ln1s, ln1b, swq, sbq, swp, sbp,
                        ln2s, ln2b, wfc, bfc, wpr, bpr,
                        num_heads=cfg.heads, act=cfg.act, interpret=interpret)
                elif space_fpp and space_fpp > 1:
                    from tvts_tpu.ops.pallas_block_attention import (
                        fused_space_attention_block_v9,
                    )

                    srT, src = fused_space_attention_block_v9(
                        trT, xT, trc, cls, ln1s, ln1b, swq, sbq, swp, sbp,
                        num_heads=cfg.heads, fpp=space_fpp,
                        wide_mm=mmg > 1 and lane_pad_gain(n_keep, space_fpp),
                        interpret=interpret)
                    xT, cls = fused_mlp_block_v7(
                        srT, src, ln2s, ln2b, wfc, bfc, wpr, bpr,
                        act=cfg.act, fpp=mlpg, interpret=interpret)
                    return (xT, cls), None
                else:
                    srT, src = fused_space_attention_block_v7(
                        trT, xT, trc, cls, ln1s, ln1b, swq, sbq, swp, sbp,
                        num_heads=cfg.heads, interpret=interpret)
                    xT, cls = fused_mlp_block_v7(
                        srT, src, ln2s, ln2b, wfc, bfc, wpr, bpr,
                        act=cfg.act, fpp=mlpg, interpret=interpret)
                return (xT, cls), None

            (xT, cls), _ = jax.lax.scan(body, (xT, cls), tuple(stacked))
            x = jnp.concatenate(
                [cls, jnp.swapaxes(xT, -1, -2).reshape(B, T * n_keep, D)],
                axis=1)
            return _pool(params, cfg, x, dtype, need_tokens)
        for i in range(cfg.layers):
            bp = params[f"blocks_{i}"]
            trT, trc = fused_time_attention_block_v7(
                xT, cls,
                bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                bp["timeattn"]["qkv"]["bias"].astype(dtype),
                bp["timeattn"]["proj"]["kernel"].astype(dtype),
                bp["timeattn"]["proj"]["bias"].astype(dtype),
                num_heads=cfg.heads, chunk=tc, mm_group=mmg,
                interpret=interpret)
            if not need_tokens and i == cfg.layers - 1 and kernel_version == 7:
                # CLS-only tail: when only the pooled embedding is consumed,
                # the LAST block's per-frame space outputs and its MLP over
                # 2352 patch tokens are dead — compute just the CLS row
                from tvts_tpu.ops.pallas_block_attention import (
                    fused_space_cls_only_v7,
                )

                src = fused_space_cls_only_v7(
                    trT, trc, cls,
                    bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                    bp["attn"]["qkv"]["kernel"].astype(dtype),
                    bp["attn"]["qkv"]["bias"].astype(dtype),
                    bp["attn"]["proj"]["kernel"].astype(dtype),
                    bp["attn"]["proj"]["bias"].astype(dtype),
                    num_heads=cfg.heads, interpret=interpret)
                mp = {"c_fc": bp["mlp"]["c_fc"], "c_proj": bp["mlp"]["c_proj"]}
                cls = src + _mlp(
                    _layernorm(src, bp["ln_2"]).astype(dtype), mp, cfg.act)
                return _pool(params, cfg, cls, dtype, need_tokens=False)
            if kernel_version == 8:
                xT, cls = fused_spacemlp_block_v7(
                    trT, xT, trc, cls,
                    bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                    bp["attn"]["qkv"]["kernel"].astype(dtype),
                    bp["attn"]["qkv"]["bias"].astype(dtype),
                    bp["attn"]["proj"]["kernel"].astype(dtype),
                    bp["attn"]["proj"]["bias"].astype(dtype),
                    bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                    bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                    bp["mlp"]["c_fc"]["bias"].astype(dtype),
                    bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                    bp["mlp"]["c_proj"]["bias"].astype(dtype),
                    num_heads=cfg.heads, act=cfg.act, interpret=interpret)
                continue
            if space_fpp and space_fpp > 1:
                from tvts_tpu.ops.pallas_block_attention import (
                    fused_space_attention_block_v9,
                )

                srT, src = fused_space_attention_block_v9(
                    trT, xT, trc, cls,
                    bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                    bp["attn"]["qkv"]["kernel"].astype(dtype),
                    bp["attn"]["qkv"]["bias"].astype(dtype),
                    bp["attn"]["proj"]["kernel"].astype(dtype),
                    bp["attn"]["proj"]["bias"].astype(dtype),
                    num_heads=cfg.heads, fpp=space_fpp,
                    wide_mm=mmg > 1 and lane_pad_gain(n_keep, space_fpp),
                    interpret=interpret)
            else:
                srT, src = fused_space_attention_block_v7(
                    trT, xT, trc, cls,
                    bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                    bp["attn"]["qkv"]["kernel"].astype(dtype),
                    bp["attn"]["qkv"]["bias"].astype(dtype),
                    bp["attn"]["proj"]["kernel"].astype(dtype),
                    bp["attn"]["proj"]["bias"].astype(dtype),
                    num_heads=cfg.heads, interpret=interpret)
            xT, cls = fused_mlp_block_v7(
                srT, src,
                bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                bp["mlp"]["c_fc"]["bias"].astype(dtype),
                bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                bp["mlp"]["c_proj"]["bias"].astype(dtype),
                act=cfg.act, fpp=mlpg, interpret=interpret)
        x = jnp.concatenate(
            [cls, jnp.swapaxes(xT, -1, -2).reshape(B, T * n_keep, D)], axis=1)
        return _pool(params, cfg, x, dtype, need_tokens)
    if kernel_version == 6:
        # whole-block megakernel: time+space+MLP in ONE Pallas call per
        # block, exact CLS rows, one HBM round-trip per block. scan_blocks
        # compiles the kernel ONCE (the unrolled v6 graph's MLIR previously
        # SIGKILLed the remote compile helper — PERF.md round 3)
        from tvts_tpu.ops.pallas_block_attention import fused_block_v6

        def v6_block(x, bp):
            return fused_block_v6(
                x, bp, num_frames=T,
                patches_per_frame=n_keep, num_heads=cfg.heads, act=cfg.act,
                mlp_chunk=mlp_chunk if mlp_chunk != 256 else 512,
                dtype=dtype, interpret=interpret)

        if scan_blocks:
            stacked = jax.tree.map(
                lambda *ls: jnp.stack(ls),
                *[params[f"blocks_{i}"] for i in range(cfg.layers)])
            x, _ = jax.lax.scan(lambda x, bp: (v6_block(x, bp), None),
                                x, stacked)
        else:
            for i in range(cfg.layers):
                x = v6_block(x, params[f"blocks_{i}"])
        return _pool(params, cfg, x, dtype, need_tokens)
    if kernel_version in (2, 4):
        # v2: self-contained sub-path kernels (in-kernel CLS row + residual);
        # no XLA-side k/v round-trips or [B,TN,H,d] tile-inflated reshapes.
        # v4 = v2 with the T-leading d-major time kernel (2 transpose sets
        # per program instead of 4; ops/pallas_block_attention.py).
        time_block = (fused_time_attention_block_v4 if kernel_version == 4
                      else fused_time_attention_block_v2)
        if space_version == 5:
            def space_block(x, base, *w, **kw):
                return fused_space_attention_block_v5(
                    x, base, *w, fpp=space_fpp, **kw)
        else:
            space_block = fused_space_attention_block_v2
        for i in range(cfg.layers):
            bp = params[f"blocks_{i}"]
            time_residual = time_block(
                x,
                bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                bp["timeattn"]["qkv"]["bias"].astype(dtype),
                bp["timeattn"]["proj"]["kernel"].astype(dtype),
                bp["timeattn"]["proj"]["bias"].astype(dtype),
                num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads,
                chunk=time_chunk, interpret=interpret)
            if not need_tokens and i == cfg.layers - 1:
                # CLS-only tail (row-major twin of the v7 tail above): the
                # LAST block's per-frame space outputs and its MLP over the
                # patch tokens are dead when only the pooled embedding is
                # consumed — compute just the CLS global row
                from tvts_tpu.ops.pallas_block_attention import (
                    fused_space_cls_only_v2,
                )

                src = fused_space_cls_only_v2(
                    time_residual, x[:, :1],
                    bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                    bp["attn"]["qkv"]["kernel"].astype(dtype),
                    bp["attn"]["qkv"]["bias"].astype(dtype),
                    bp["attn"]["proj"]["kernel"].astype(dtype),
                    bp["attn"]["proj"]["bias"].astype(dtype),
                    num_frames=T, patches_per_frame=n_keep,
                    num_heads=cfg.heads, interpret=interpret)
                mp = {"c_fc": bp["mlp"]["c_fc"], "c_proj": bp["mlp"]["c_proj"]}
                cls = src + _mlp(
                    _layernorm(src, bp["ln_2"]).astype(dtype), mp, cfg.act)
                return _pool(params, cfg, cls, dtype, need_tokens=False)
            space_residual = space_block(
                time_residual, x,
                bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                bp["attn"]["qkv"]["kernel"].astype(dtype),
                bp["attn"]["qkv"]["bias"].astype(dtype),
                bp["attn"]["proj"]["kernel"].astype(dtype),
                bp["attn"]["proj"]["bias"].astype(dtype),
                num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads,
                interpret=interpret)
            x = fused_mlp_block(
                space_residual,
                bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                bp["mlp"]["c_fc"]["bias"].astype(dtype),
                bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                bp["mlp"]["c_proj"]["bias"].astype(dtype),
                act=cfg.act, chunk=mlp_chunk, interpret=interpret)
        return _pool(params, cfg, x, dtype, need_tokens)

    for i in range(cfg.layers):
        bp = params[f"blocks_{i}"]
        if fuse_time:
            t_out = fused_time_attention_block(
                x,
                bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                bp["timeattn"]["qkv"]["bias"].astype(dtype),
                bp["timeattn"]["proj"]["kernel"].astype(dtype),
                bp["timeattn"]["proj"]["bias"].astype(dtype),
                num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads,
                interpret=interpret)
        else:
            t_out = _var_attention_xla(_layernorm(x, bp["ln_3"]), bp["timeattn"],
                                       T, n_keep, "time", cfg.heads)
        time_residual = x + t_out
        # space sub-path: fused megakernel (ln_1 + qkv + attention + proj)
        s_out = fused_space_attention_block(
            time_residual,
            bp["ln_1"]["scale"], bp["ln_1"]["bias"],
            bp["attn"]["qkv"]["kernel"].astype(dtype),
            bp["attn"]["qkv"]["bias"].astype(dtype),
            bp["attn"]["proj"]["kernel"].astype(dtype),
            bp["attn"]["proj"]["bias"].astype(dtype),
            num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads,
            interpret=interpret)
        space_residual = x + s_out
        if fuse_mlp:
            x = fused_mlp_block(
                space_residual,
                bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                bp["mlp"]["c_fc"]["bias"].astype(dtype),
                bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                bp["mlp"]["c_proj"]["bias"].astype(dtype),
                act=cfg.act, interpret=interpret)
        else:
            x = space_residual + _mlp(_layernorm(space_residual, bp["ln_2"]),
                                      bp["mlp"], cfg.act)

    return _pool(params, cfg, x, dtype, need_tokens)


def _embed_stem(params, cfg, video, keep_ind, dtype):
    """Patchify + pos/temporal embed + tube mask + CLS + ln_pre (the
    SpaceTimeViT stem, video_encoder_ViT_B_16.py:176-216). Differentiable."""
    if video.ndim == 4:
        video = video[:, None]
    B, T, C, H, W = video.shape

    frames = video.reshape(B * T, C, H, W).transpose(0, 2, 3, 1).astype(dtype)
    x = jax.lax.conv_general_dilated(
        frames, params["conv1"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n = x.shape[1] * x.shape[2]
    x = x.reshape(B, T, n, cfg.width)

    pos = params["positional_embedding"]
    x = x + (pos[None, None, 1:] + params["temporal_embedding"][None, :T, None]
             ).astype(dtype)
    if keep_ind is not None:
        x = gather_tube_tokens(x, keep_ind)
    cls = (params["class_embedding"] + pos[0]).astype(dtype)
    x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.width)),
                         x.reshape(B, -1, cfg.width)], axis=1)
    return _layernorm(x, params["ln_pre"]), T


def make_fused_train_forward(cfg: VisionConfig, num_frames: int, n_keep: int,
                             dtype=jnp.bfloat16, time_chunk: int = 128,
                             mlp_chunk: int = 256, mlp_mode: str = "xla",
                             space_mode: str = "pallas_v10r",
                             time_mode: str = "pallas",
                             save_acts: bool = True,
                             scan_blocks: bool = False,
                             layout: str = "row",
                             space_fpp: int | None = None,
                             time_vmem_mb: int = 100,
                             smv: str | None = None,
                             interpret: bool = False):
    """DIFFERENTIABLE fused tower forward: the two attention sub-paths run the
    v2 megakernels with custom-VJP Pallas backwards (ops/pallas_block_backward);
    the MLP sub-path runs as plain XLA by default — measured on v5e
    (tools/bwd_split_probe.py, B=32 pretrain shapes) XLA's MLP fwd+bwd is
    58.4 ms/12 blocks vs 92.8 for the Pallas pair, because XLA's backward
    reuses the saved hidden activations while the kernel recomputes them.
    mlp_mode="pallas" keeps the all-kernel path (lower activation memory).
    Shapes are fixed at factory time (num_frames, n_keep) as in training.

    layout="dmajor" runs the d-major TOWER (v7 train): activations stay
    [B,T,D,N] (+ row-major [B,1,D] CLS) across ALL blocks, all three
    sub-paths (incl. the MLP, which saves its pre-activation hiddens) run v7
    Pallas kernels with custom-VJP backwards, and every per-program
    lane<->sublane transpose of the v2/v3 train kernels disappears — the
    boundary transposes are paid once at tower entry/exit (and mirrored
    automatically in their AD). space/time/mlp modes are ignored there.

    Returns fn(params, video, keep_ind) -> (pooled, tokens)."""
    from tvts_tpu.ops.pallas_block_attention import make_mlp_subpath
    from tvts_tpu.ops.pallas_block_backward import (
        make_space_subpath,
        make_time_subpath,
    )

    if layout not in ("row", "dmajor"):
        raise ValueError(f"layout {layout!r} not in ('row', 'dmajor')")
    if cfg.ls_init is not None:
        # the fused block_weights read ln/attn/mlp params only — a LayerScale
        # config would silently skip the ls_* gammas (wrong forward, zero
        # grads). No shipped config enables LayerScale (H/14 ships
        # ls_init=None, models/configs.py); use the XLA path for one.
        raise NotImplementedError(
            "fused train kernels do not support LayerScale (cfg.ls_init "
            "set); run the XLA path for ls configs")
    if layout == "dmajor":
        return _make_dmajor_train_forward(cfg, num_frames, n_keep,
                                          dtype=dtype, time_chunk=time_chunk,
                                          scan_blocks=scan_blocks,
                                          space_fpp=space_fpp,
                                          save_probs=space_mode == "pallas_ps",
                                          interpret=interpret)
    if space_mode not in ("pallas", "pallas_ps", "pallas_v2", "pallas_v5",
                          "pallas_v10", "pallas_v10r", "xla"):
        raise ValueError(f"space_mode {space_mode!r} not in "
                         "('pallas', 'pallas_ps', 'pallas_v2', 'pallas_v5',"
                         " 'pallas_v10', 'pallas_v10r', 'xla')")
    if mlp_mode not in ("pallas", "xla"):
        raise ValueError(f"mlp_mode {mlp_mode!r} not in ('pallas', 'xla')")
    if time_mode not in ("pallas", "pallas_tps", "pallas_v3", "xla"):
        raise ValueError(f"time_mode {time_mode!r} not in "
                         "('pallas', 'pallas_tps', 'pallas_v3', 'xla')")
    if time_mode == "xla":
        # H/14 memory mode: the v2 time backward's scoped VMEM (f32
        # weight-grad accumulators + recompute working set at D=1280)
        # exceeds the v5e's ~100 MB scoped ceiling (112-127 MB measured);
        # XLA's time sub-path is layout-slow at B/16 but its probs tensors
        # are tiny (T=12 keys/query), so it composes with the fused space
        # sub-path without the remat-copy regression the SPACE-XLA hybrid hit
        @jax.checkpoint
        def time_f(x, ln_s, ln_b, wq, bq, wp, bp):
            # rematerialized: without it the XLA sub-path's saved
            # intermediates put H/14 B=4 ~1.5 GB over HBM
            p = {"qkv": {"kernel": wq, "bias": bq},
                 "proj": {"kernel": wp, "bias": bp}}
            ln = {"scale": ln_s, "bias": ln_b}
            return x + _var_attention_xla(
                _layernorm(x, ln), p, num_frames, n_keep, "time", cfg.heads)
    elif time_mode == "pallas_v3":
        # v3 d-major T-leading backward (transposed saves): see
        # ops/pallas_block_backward.make_time_subpath_v3 + PERF.md round 3
        from tvts_tpu.ops.pallas_block_backward import make_time_subpath_v3

        time_f = make_time_subpath_v3(num_frames, n_keep, cfg.heads,
                                      chunk=time_chunk, interpret=interpret)
    else:
        # pallas_tps: the forward also saves the per-frame softmax probs so
        # the backward skips its per-t l/exp/denom chain (~90 MB/block at
        # B=20 pretrain shapes)
        time_f = make_time_subpath(num_frames, n_keep, cfg.heads,
                                   chunk=time_chunk, save_acts=save_acts,
                                   save_probs=time_mode == "pallas_tps",
                                   vmem_limit_mb=time_vmem_mb,
                                   interpret=interpret)
    if not save_acts and space_mode in ("pallas", "pallas_ps",
                                        "pallas_v10", "pallas_v10r"):
        # flash-style recompute (H/14 single-chip memory mode): the v3
        # kernels require saved acts, so the space sub-path drops to v2
        space_mode = "pallas_v2"
    if space_mode in ("pallas", "pallas_ps"):
        # v3 d-major head-batched kernels: space sub-path fwd+bwd measured
        # 145.1 vs 167.2 ms/12 blocks for the per-head v2 pair at B=32
        # pretrain shapes (tools/bwd_split_probe.py table in PERF.md).
        # pallas_ps additionally saves the forward softmax state so the
        # backward skips the logits + softmax recompute (~55 MB/block of
        # probs saves at B=20 pretrain shapes)
        from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v3

        space_f = make_space_subpath_v3(num_frames, n_keep, cfg.heads,
                                        save_probs=space_mode == "pallas_ps",
                                        interpret=interpret)
    elif space_mode in ("pallas_v10", "pallas_v10r"):
        # v9 FPP-frame-batched attention + row tower I/O (the extraction v9
        # win applied to training); pallas_v10 also saves the forward
        # softmax state for the backward, pallas_v10r recomputes it
        # (memory-neutral vs pallas)
        from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v10

        # measured peaks (PERF.md): fpp=4 with the probs-saving backward
        # (94.65 clips/s at B=20), fpp=3 with recompute (90.54)
        fpp = space_fpp or (4 if space_mode == "pallas_v10" else 3)
        if num_frames % fpp:
            fpp = next((c for c in (4, 3, 2) if num_frames % c == 0), 1)
        # round-4 mm_group trick on the v10 qkv/proj (+grad) matmuls: only
        # when the lane pad shrinks (at train n_keep=98 that needs fpp=6)
        from tvts_tpu.ops.pallas_block_attention import lane_pad_gain

        space_f = make_space_subpath_v10(num_frames, n_keep, cfg.heads,
                                         fpp=fpp,
                                         save_probs=space_mode == "pallas_v10",
                                         wide_mm=lane_pad_gain(n_keep, fpp),
                                         smv=smv, interpret=interpret)
    elif space_mode == "pallas_v5":
        # frame-batched row-major kernels (batched per-head dot_generals,
        # big-K weight grads, no in-kernel weight transposes)
        from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v5

        space_f = make_space_subpath_v5(num_frames, n_keep, cfg.heads,
                                        interpret=interpret)
    elif space_mode == "pallas_v2":
        space_f = make_space_subpath(num_frames, n_keep, cfg.heads,
                                     save_acts=save_acts, interpret=interpret)
    else:
        def space_f(x, base, ln_s, ln_b, wq, bq, wp, bp):
            p = {"qkv": {"kernel": wq, "bias": bq},
                 "proj": {"kernel": wp, "bias": bp}}
            ln = {"scale": ln_s, "bias": ln_b}
            return base + _var_attention_xla(
                _layernorm(x, ln), p, num_frames, n_keep, "space", cfg.heads)
    if mlp_mode == "pallas":
        mlp_f = make_mlp_subpath(act=cfg.act, chunk=mlp_chunk,
                                 interpret=interpret)
    else:
        def mlp_f(x, ln_s, ln_b, wfc, bfc, wpr, bpr):
            p = {"c_fc": {"kernel": wfc, "bias": bfc},
                 "c_proj": {"kernel": wpr, "bias": bpr}}
            ln = {"scale": ln_s, "bias": ln_b}
            return x + _mlp(_layernorm(x, ln), p, cfg.act)

    def block_weights(bp):
        return ((bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                 bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                 bp["timeattn"]["qkv"]["bias"].astype(dtype),
                 bp["timeattn"]["proj"]["kernel"].astype(dtype),
                 bp["timeattn"]["proj"]["bias"].astype(dtype)),
                (bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                 bp["attn"]["qkv"]["kernel"].astype(dtype),
                 bp["attn"]["qkv"]["bias"].astype(dtype),
                 bp["attn"]["proj"]["kernel"].astype(dtype),
                 bp["attn"]["proj"]["bias"].astype(dtype)),
                (bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                 bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                 bp["mlp"]["c_fc"]["bias"].astype(dtype),
                 bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                 bp["mlp"]["c_proj"]["bias"].astype(dtype)))

    def block_body(x, bw):
        tw, sw, mw = bw
        tr = time_f(x, *tw)
        sr = space_f(tr, x, *sw)
        return mlp_f(sr, *mw)

    def fwd(params, video, keep_ind=None):
        x, T = _embed_stem(params, cfg, video, keep_ind, dtype)
        assert T == num_frames and (x.shape[1] - 1) // T == n_keep, \
            "shape mismatch vs factory configuration"
        if scan_blocks:
            # lax.scan over stacked per-block weights: each sub-path kernel
            # (and its custom-VJP backward) is traced/compiled ONCE instead
            # of cfg.layers times — the fused H/14 train graph's MLIR shrinks
            # ~cfg.layers x, below the remote compile helper's memory cap.
            # scan AD stacks the per-block residuals exactly as the unrolled
            # loop saves them, so activation memory is unchanged.
            stacked = jax.tree.map(
                lambda *ls: jnp.stack(ls),
                *[block_weights(params[f"blocks_{i}"])
                  for i in range(cfg.layers)])
            x, _ = jax.lax.scan(lambda x, bw: (block_body(x, bw), None),
                                x, stacked)
        else:
            for i in range(cfg.layers):
                x = block_body(x, block_weights(params[f"blocks_{i}"]))
        return _pool(params, cfg, x, dtype)

    return fwd


def _make_dmajor_train_forward(cfg: VisionConfig, num_frames: int,
                               n_keep: int, dtype=jnp.bfloat16,
                               time_chunk: int = 128,
                               scan_blocks: bool = False,
                               space_fpp: int | None = None,
                               save_probs: bool = False,
                               interpret: bool = False):
    """The v7 d-major differentiable tower (see make_fused_train_forward's
    layout="dmajor" docstring). space_fpp>1 swaps the space sub-path for the
    v9 FPP-frame-batched kernels; save_probs makes its backward consume the
    forward-saved softmax state."""
    from tvts_tpu.ops.pallas_block_backward import (
        make_mlp_subpath_v7,
        make_space_subpath_v7,
        make_space_subpath_v9,
        make_time_subpath_v7,
    )

    tc = time_chunk if n_keep % time_chunk == 0 else None
    time_f = make_time_subpath_v7(cfg.heads, chunk=tc, interpret=interpret)
    if space_fpp and space_fpp > 1:
        space_f = make_space_subpath_v9(cfg.heads, fpp=space_fpp,
                                        save_probs=save_probs,
                                        interpret=interpret)
    else:
        space_f = make_space_subpath_v7(cfg.heads, interpret=interpret)
    mlp_f = make_mlp_subpath_v7(act=cfg.act, interpret=interpret)

    def block_weights(bp):
        return ((bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                 bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                 bp["timeattn"]["qkv"]["bias"].astype(dtype),
                 bp["timeattn"]["proj"]["kernel"].astype(dtype),
                 bp["timeattn"]["proj"]["bias"].astype(dtype)),
                (bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                 bp["attn"]["qkv"]["kernel"].astype(dtype),
                 bp["attn"]["qkv"]["bias"].astype(dtype),
                 bp["attn"]["proj"]["kernel"].astype(dtype),
                 bp["attn"]["proj"]["bias"].astype(dtype)),
                (bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                 bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                 bp["mlp"]["c_fc"]["bias"].astype(dtype),
                 bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                 bp["mlp"]["c_proj"]["bias"].astype(dtype)))

    def block_body(carry, bw):
        xT, cls = carry
        tw, sw, mw = bw
        trT, trc = time_f(xT, cls, *tw)
        srT, src = space_f(trT, xT, trc, cls, *sw)
        return mlp_f(srT, src, *mw)

    def fwd(params, video, keep_ind=None):
        x, T = _embed_stem(params, cfg, video, keep_ind, dtype)
        assert T == num_frames and (x.shape[1] - 1) // T == n_keep, \
            "shape mismatch vs factory configuration"
        B, D = x.shape[0], cfg.width
        cls = x[:, :1]
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, n_keep, D), -1, -2)
        if scan_blocks:
            stacked = jax.tree.map(
                lambda *ls: jnp.stack(ls),
                *[block_weights(params[f"blocks_{i}"])
                  for i in range(cfg.layers)])
            (xT, cls), _ = jax.lax.scan(
                lambda c, bw: (block_body(c, bw), None), (xT, cls), stacked)
        else:
            for i in range(cfg.layers):
                xT, cls = block_body((xT, cls),
                                     block_weights(params[f"blocks_{i}"]))
        x = jnp.concatenate(
            [cls, jnp.swapaxes(xT, -1, -2).reshape(B, T * n_keep, D)], axis=1)
        return _pool(params, cfg, x, dtype)

    return fwd


def make_fused_train_apply(model, cfg, num_frames: int, n_keep: int,
                           dtype=jnp.bfloat16, time_chunk: int = 128,
                           mlp_mode: str = "xla",
                           space_mode: str = "pallas_v10r",
                           time_mode: str = "pallas", save_acts: bool = True,
                           scan_blocks: bool = False, layout: str = "row",
                           space_fpp: int | None = None,
                           time_vmem_mb: int = 100,
                           smv: str | None = None,
                           text_mode: str = "xla",
                           text_tune_from: int | None = None,
                           sort_mode: str = "xla",
                           interpret: bool = False,
                           mesh=None, data_axes=("dp", "fsdp")):
    """Apply adapter for train/step.make_train_step(apply_fn=...): the video
    tower runs the fused differentiable forward; text + sort head run through
    the flax module (cheap). Mirrors TVTSv2.__call__ (models/tvts_v2.py).

    Sharding contract (VERDICT r3 #3): a pallas_call is opaque to GSPMD, so
    under a mesh the fused tower must be explicitly partitioned. Pass
    ``mesh`` (+ the batch ``data_axes``) and the tower runs inside a
    jax.shard_map over those axes: video/keep_ind split on batch (the
    kernels' grid-over-B runs per shard, so the per-shard batch — B divided
    by the product of data axes — must be >= 1), params replicated into each
    shard (fsdp-sharded params are all-gathered at the shard_map boundary
    and their cotangents reduce-scattered back, which IS the fsdp
    gather-for-compute semantics), and AD through shard_map psums the
    replicated params' grads across shards — reproducing the XLA path's
    DDP-grad-allreduce contract (reference v2/trainer/trainer.py:41-57).
    Text tower + sort head + the global sim-matrix loss stay OUTSIDE the
    shard_map in plain GSPMD jit, so the contrastive all_gather semantics
    are unchanged — except with text_mode="pallas", where the fused text
    kernels (opaque to GSPMD like every pallas_call) run in their own
    shard_map over the text rows. sp/tp axes are NOT supported through the kernel
    boundary — token/head sharding inside a pallas program needs the XLA
    path (the kernels assume whole [N, D] tiles per program)."""
    tower_fwd = make_fused_train_forward(cfg.vision, num_frames, n_keep,
                                         dtype=dtype, time_chunk=time_chunk,
                                         mlp_mode=mlp_mode,
                                         space_mode=space_mode,
                                         time_mode=time_mode,
                                         save_acts=save_acts,
                                         scan_blocks=scan_blocks,
                                         layout=layout,
                                         space_fpp=space_fpp,
                                         time_vmem_mb=time_vmem_mb,
                                         smv=smv, interpret=interpret)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        axes = tuple(a for a in data_axes if a in mesh.axis_names
                     and mesh.shape[a] > 1) or None
        if axes is not None:
            batch_spec = P(axes)
            inner_fwd = tower_fwd
            with_keep = jax.shard_map(
                inner_fwd, mesh=mesh,
                in_specs=(P(), batch_spec, batch_spec),
                out_specs=(batch_spec, batch_spec),
                check_vma=False)
            no_keep = jax.shard_map(
                lambda p, v: inner_fwd(p, v, None), mesh=mesh,
                in_specs=(P(), batch_spec),
                out_specs=(batch_spec, batch_spec),
                check_vma=False)

            def tower_fwd(vparams, video, keep_ind):  # noqa: F811
                if keep_ind is None:
                    return no_keep(vparams, video)
                return with_keep(vparams, video, keep_ind)

    if text_mode == "pallas":
        from tvts_tpu.ops.pallas_text_attention import (
            text_transformer_fused_forward,
        )

        def text_fwd(tparams, ids):
            return text_transformer_fused_forward(
                tparams, cfg.text, ids, dtype=dtype,
                tune_from=text_tune_from, interpret=interpret)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            taxes = tuple(a for a in data_axes if a in mesh.axis_names
                          and mesh.shape[a] > 1) or None
            if taxes is not None:
                # text rows ([n_trans * B, ctx]) are per-sequence independent,
                # so splitting dim 0 over the data axes is exact regardless of
                # the clip-major ordering
                text_fwd = jax.shard_map(
                    text_fwd, mesh=mesh, in_specs=(P(), P(taxes)),
                    out_specs=P(taxes), check_vma=False)

        def compute_text(params, ids):
            return text_fwd(params["text_model"], ids)
    else:
        def compute_text(params, ids):
            return model.apply({"params": params}, ids,
                               method=lambda m, t: m.compute_text(t))

    if sort_mode == "pallas":
        from tvts_tpu.ops.pallas_text_attention import (
            sort_transformer_fused_forward,
        )

        def sort_fwd(sparams, sort_text, tokens):
            return sort_transformer_fused_forward(
                sparams, cfg.sort, sort_text, tokens, dtype=dtype,
                interpret=interpret)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            saxes = tuple(a for a in data_axes if a in mesh.axis_names
                          and mesh.shape[a] > 1) or None
            if saxes is not None:
                sort_fwd = jax.shard_map(
                    sort_fwd, mesh=mesh,
                    in_specs=(P(), P(saxes), P(saxes)),
                    out_specs=P(saxes), check_vma=False)

        def compute_sort(params, sort_text, tokens):
            return sort_fwd(params["pred_model"], sort_text, tokens)
    else:
        def compute_sort(params, sort_text, tokens):
            return model.apply({"params": params}, sort_text, tokens,
                               method=lambda m, a, b: m.pred_model(a, b))

    def apply(params, batch):
        video, text_ids = batch["video"], batch["text_ids"]
        keep_ind = batch.get("keep_ind")
        bz = video.shape[0]
        text_emb = compute_text(params, text_ids)
        n_trans = text_emb.shape[0] // bz
        per_clip = text_emb.reshape(n_trans, bz, text_emb.shape[-1])
        text_embeddings = per_clip.mean(axis=0)
        pooled, tokens = tower_fwd(params["video_model"], video, keep_ind)
        predict_order = None
        if n_trans != 1:
            sort_text = jax.lax.stop_gradient(per_clip).transpose(1, 0, 2)
            predict_order = compute_sort(params, sort_text, tokens)
        return text_embeddings, pooled, predict_order

    return apply


def _pool(params, cfg, x, dtype, need_tokens=True):
    proj = params["proj"].astype(dtype)
    if cfg.pool_style == "openai":
        if not need_tokens:
            # extraction only consumes the CLS embedding; LN is per-token so
            # narrowing to row 0 before the projection is numerically exact
            # (XLA does not reliably push the slice through the matmul)
            return _layernorm(x[:, :1], params["ln_post"])[:, 0] @ proj, None
        full = _layernorm(x, params["ln_post"]) @ proj
        return full[:, 0], full
    # openclip (H/14): ln_post on the CLS only; tokens without ln_post/CLS
    pooled = _layernorm(x[:, :1], params["ln_post"])[:, 0] @ proj
    tokens = x[:, 1:] @ proj if need_tokens else None
    return pooled, tokens
