"""Clamp-safety audit (tools/logit_audit.py): exact max-logit helper +
capture_intermediates walk over the video tower.

The smv="cp" extraction softmax is exact only while every attention logit
<= 80 (ops/kernel_config.py clamp-safety rule); the audit must therefore
report the TRUE max over exactly the divided-attention groups the kernels
compute (reference VarAttention grouping, v2/model/video_encoder_ViT_B_16.py:
18-76), not an all-pairs overestimate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.ops.attention import divided_attention_max_logit


def _brute_force_max(q, k, T, N, mode):
    """Max logit via explicit per-group loops (oracle)."""
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    B, H, S, d = q.shape
    best = -np.inf
    best = max(best, np.einsum("bhd,bhjd->bhj", q[:, :, 0], k).max())  # CLS row
    for t in range(T):
        for n in range(N):
            i = 1 + t * N + n
            qi = q[:, :, i]  # [B,H,d]
            best = max(best, np.einsum("bhd,bhd->bh", qi, k[:, :, 0]).max())
            if mode == "space":
                group = [1 + t * N + m for m in range(N)]
            else:
                group = [1 + s * N + n for s in range(T)]
            best = max(best, np.einsum(
                "bhd,bhjd->bhj", qi, k[:, :, group]).max())
    return best


def test_divided_attention_max_logit_exact():
    B, H, T, N, d = 2, 3, 4, 5, 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, 1 + T * N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, 1 + T * N, d)), jnp.float32)
    for mode in ("space", "time"):
        got = float(divided_attention_max_logit(q, k, T, N, mode))
        want = _brute_force_max(q, k, T, N, mode)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_audit_video_tower_structure_and_monotonicity():
    from tools.logit_audit import audit_video_tower

    cfg = VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                       heads=4, output_dim=48, num_frames=4, mask_ratio=0.0)
    model = SpaceTimeViT(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)["params"]

    report = audit_video_tower(model, params, video)
    assert set(report) == {0, 1}
    for row in report.values():
        assert np.isfinite(row["time"]) and np.isfinite(row["space"])

    # scaling the space qkv kernel scales q AND k -> max space logit must grow
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    boosted = {kk: (v * 8.0 if ("attn" in kk and "qkv" in kk and kk[-1] == "kernel"
                                and "timeattn" not in kk) else v)
               for kk, v in flat.items()}
    boosted = flax.traverse_util.unflatten_dict(boosted)
    report2 = audit_video_tower(model, boosted, video)
    assert report2[0]["space"] > report[0]["space"]
    assert report2[1]["space"] > report[1]["space"]
