"""Alternating-attention aggregator: the VGGT multi-view trunk.

Per the VGGT paper (PAPERS.md; SURVEY.md section 2.2): each frame's DINO patch
tokens are prepended with one camera token and `num_register_tokens` register
tokens (separate parameters for frame 0 vs the rest, which is how the model
designates the reference view), then processed by `agg_depth` pairs of

  * frame attention  - self-attention within each frame's tokens, and
  * global attention - self-attention over all frames x all tokens jointly
    (the O((S*P)^2) hot block; flash kernel on TPU),

with 2D RoPE on patch tokens. The per-depth outputs consumed by downstream
heads are concat(frame_out, global_out) - 2*agg_dim channels.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.modules import Block, rope_2d_angles
from vggt_slam_tpu.models.vggt.vit import DinoViT


class Aggregator(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images: jax.Array,
                 valid_frames=None) -> Dict[int, jax.Array]:
        """images: (S, 3, H, W) in [0,1].

        `valid_frames` (python int or traced int32 scalar) enables submap
        bucketing: frames at index >= valid_frames are padding - they are
        excluded from every global attention softmax (suffix key masking),
        so their garbage content cannot contaminate real frames, and the jit
        program compiles once per bucket size regardless of the actual frame
        count (traced form).

        Returns dict depth_index -> (S, ns + P, 2*agg_dim) token maps for the
        captured depths (cfg.dpt_layers; always includes the final depth),
        plus the special-token count under key "patch_start".
        """
        cfg = self.cfg
        S, _, H, W = images.shape
        h, w = cfg.patch_grid(H, W)
        P = h * w
        ns = cfg.tokens_per_frame_special
        N = ns + P
        global_valid = None if valid_frames is None else valid_frames * N

        x = DinoViT(cfg, name="patch_embed")(images)  # (S, P, enc_dim)
        if cfg.enc_dim != cfg.agg_dim:
            x = nn.Dense(cfg.agg_dim, dtype=cfg.dtype, name="input_proj")(x)

        # Camera + register tokens; index 0 params for frame 0, index 1 shared
        # by all other frames.
        cam_tok = self.param("camera_token", nn.initializers.normal(0.02),
                             (2, 1, cfg.agg_dim), jnp.float32)
        reg_tok = self.param("register_token", nn.initializers.normal(0.02),
                             (2, cfg.num_register_tokens, cfg.agg_dim), jnp.float32)
        sel = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.ones((S - 1,), jnp.int32)]) if S > 1 else \
            jnp.zeros((1,), jnp.int32)
        special = jnp.concatenate([cam_tok, reg_tok], axis=1)[sel]  # (S, ns, C)
        x = jnp.concatenate([special.astype(x.dtype), x], axis=1)  # (S, N, C)

        # Full-length 2D RoPE tables: identity rotation on special tokens,
        # per-patch (y, x) angles on the grid; frame-major tiling for the
        # global sequence. Patch positions are 1-BASED: the released
        # aggregator shifts the grid by +1 and assigns position (0, 0) to
        # the camera/register tokens, so position 0 (zero angle = identity
        # rotation) is reserved for specials and patch (0,0) is distinct
        # from them (torch-golden: tests/test_model_torch_parity.py).
        yy, xx = jnp.meshgrid(jnp.arange(1, h + 1, dtype=jnp.float32),
                              jnp.arange(1, w + 1, dtype=jnp.float32),
                              indexing="ij")
        positions = jnp.stack([yy.ravel(), xx.ravel()], axis=-1)  # (P, 2)
        head_dim = cfg.agg_dim // cfg.agg_heads
        cos_p, sin_p = rope_2d_angles(positions, head_dim, cfg.rope_base)
        cos = jnp.concatenate([jnp.ones((ns, head_dim // 2)), cos_p], axis=0)
        sin = jnp.concatenate([jnp.zeros((ns, head_dim // 2)), sin_p], axis=0)
        cos_g = jnp.tile(cos, (S, 1))
        sin_g = jnp.tile(sin, (S, 1))

        # Global K/V token merging (cfg.global_kv_stride > 1): keys/values
        # keep all of frame 0 + specials + one slot per stride-r patch group
        # of later frames. Frame-major order is preserved, so padded frames
        # remain a maskable suffix of the kv sequence. With
        # cfg.global_merge == "sim" (FastVGGT's method, PAPERS.md:8) the
        # dropped patch tokens do not vanish: each merges into its
        # most-similar kept token of the SAME frame (weighted token mean
        # before the linear k/v projection == weighted key/value mean) with
        # a log-group-size logit bias (ToMe proportional attention); the
        # assignment is computed ONCE from the tokens entering the first
        # global block and shared by all 24 (training-free, as FastVGGT).
        kv_index = None
        kv_valid = global_valid
        cos_kv = sin_kv = None
        merge_sim = (cfg.global_kv_stride > 1 and S > 1 and
                     cfg.global_merge == "sim")
        if merge_sim:
            _check_fatal_merge_family(cfg, jax.default_backend())
        if cfg.global_kv_stride > 1 and S > 1:
            import numpy as onp
            r = cfg.global_kv_stride
            dst_patch = onp.arange(0, P, r)
            src_patch = onp.setdiff1d(onp.arange(P), dst_patch)
            per_frame = onp.concatenate([onp.arange(ns), ns + dst_patch])
            idx = [onp.arange(N)]
            idx += [f * N + per_frame for f in range(1, S)]
            kv_index = jnp.asarray(onp.concatenate(idx), dtype=jnp.int32)
            cos_kv = cos_g[kv_index]
            sin_kv = sin_g[kv_index]
            if valid_frames is not None:
                kv_valid = N + (jnp.maximum(valid_frames, 1) - 1) * len(per_frame)
            Pd = len(dst_patch)
            dst_idx = jnp.asarray(ns + dst_patch, jnp.int32)
            src_idx = jnp.asarray(ns + src_patch, jnp.int32)

        merge_state: dict = {}

        def _compute_assignment(x):
            """(Shared) src->dst map from tokens entering global block 0:
            cosine similarity within each non-reference frame.

            The assignment is materialized as one per-frame merge matrix
            M (S-1, Pd, P) with M[f, d, :] = mean-pool weights of group d
            (1/cnt at the kept token and at each src assigned to it), so
            every block's kv_map is a single batched MXU matmul over the
            frame's patch tokens — no per-block gathers (the earlier
            gather+einsum+add formulation spent ~2x the matmul time in
            HBM-unfriendly gathers, 24x per forward)."""
            xf = x[1:].astype(jnp.float32)                     # (S-1, N, C)
            dst = xf[:, dst_idx]
            src = xf[:, src_idx]
            dn = dst / (jnp.linalg.norm(dst, axis=-1, keepdims=True) + 1e-6)
            sn = src / (jnp.linalg.norm(src, axis=-1, keepdims=True) + 1e-6)
            sim = jnp.einsum("fsc,fdc->fsd", sn, dn)
            a = jnp.argmax(sim, axis=-1)                       # (S-1, Ps)
            # A_t[f, d, s] = 1 iff src s of frame f merges into dst d.
            A_t = (a[:, None, :] ==
                   jnp.arange(Pd, dtype=a.dtype)[None, :, None]
                   ).astype(jnp.float32)                       # (S-1, Pd, Ps)
            cnt = jnp.sum(A_t, axis=2) + 1.0                   # (S-1, Pd)
            M = jnp.zeros((S - 1, Pd, P), jnp.float32)
            # Explicit dtype: under leaked jax_enable_x64 (several test
            # modules flip it process-wide) a default-dtype eye is f64 and
            # the scatter into f32 M becomes an error in future JAX.
            M = M.at[:, :, dst_patch].set(jnp.eye(Pd, dtype=jnp.float32))
            M = M.at[:, :, src_patch].set(A_t)
            M_scaled = (M * (1.0 / cnt)[..., None]).astype(cfg.dtype)
            # Proportional-attention bias, frame-major kv layout: zeros for
            # frame 0 and specials, log(group size) for merged patch slots.
            zrow = jnp.zeros((S - 1, ns), jnp.float32)
            rows = jnp.concatenate([zrow, jnp.log(cnt)], axis=1)
            bias = jnp.concatenate(
                [jnp.zeros((N,), jnp.float32), rows.reshape(-1)])
            # optimization_barrier: numerically the identity, but it
            # forbids XLA from fusing the assignment computation (argmax /
            # one-hot scatter) into downstream consumers. The r4 bisect
            # localized the axon-worker-fatal family to the sim-merge
            # GLUE's fusion context at narrow widths (ARCHITECTURE §9 —
            # the isolated kernel and the stride-merge forward are clean,
            # sim merge crashes); isolating the glue on both sides is the
            # root-cause-level mitigation (r5: the un-barriered composite
            # wedged the worker at width 256 in the full eval program even
            # though the bare forward probed clean, so the trigger is the
            # fusion context, not the width alone).
            merge_state["M"], merge_state["bias"] = \
                jax.lax.optimization_barrier((M_scaled, bias))

        def _kv_map(xg):
            """(1, S*N, C) post-norm tokens -> (1, n_kv, C) merged K/V set."""
            x_ = xg.reshape(S, N, -1)
            if not merge_sim:
                return xg[:, kv_index]
            patches = x_[1:, ns:]                              # (S-1, P, C)
            merged = jnp.einsum("fdp,fpc->fdc",
                                merge_state["M"].astype(x_.dtype), patches)
            rest = jnp.concatenate([x_[1:, :ns], merged], axis=1)
            kv = jnp.concatenate(
                [x_[0], rest.reshape((S - 1) * (ns + Pd), x_.shape[-1])])
            # Isolate the merge contraction from the attention custom
            # call's fusion context (see _compute_assignment's barrier).
            return jax.lax.optimization_barrier(kv)[None]

        captured: Dict[int, jax.Array] = {}
        capture_set = set(cfg.dpt_layers) | {cfg.agg_depth - 1}
        # Gradient checkpointing (cfg.remat): recompute block activations in
        # the backward pass. Global blocks stay un-rematted when K/V merging
        # is on - the kv_map closure is a non-array argument jax.checkpoint
        # can't thread (training runs exact attention; see config.remat).
        FrameBlock = nn.remat(Block) if cfg.remat else Block
        GlobalBlock = nn.remat(Block) if (cfg.remat and kv_index is None) \
            else Block
        for d in range(cfg.agg_depth):
            x = FrameBlock(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                           layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                           attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm,
                           name=f"frame_block_{d}")(
                x, cos, sin)
            frame_out = x

            if merge_sim and d == 0:
                _compute_assignment(x)

            xg = x.reshape(1, S * N, cfg.agg_dim)
            xg = GlobalBlock(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                       layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                       attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm,
                       qk_int8=cfg.global_qk_int8,
                       softmax_mode=cfg.global_softmax,
                       seq_mesh=cfg.global_seq_mesh,
                       seq_axis=cfg.global_seq_axis,
                       name=f"global_block_{d}")(
                xg, cos_g, sin_g, valid_len=global_valid,
                kv_map=None if kv_index is None else _kv_map,
                kv_valid_len=kv_valid, kv_rope_cos=cos_kv, kv_rope_sin=sin_kv,
                kv_bias=merge_state.get("bias"))
            x = xg.reshape(S, N, cfg.agg_dim)

            if d in capture_set:
                captured[d] = jnp.concatenate([frame_out, x], axis=-1)

        captured["patch_start"] = ns
        return captured


def _check_fatal_merge_family(cfg, backend: str) -> None:
    """Fence the measured worker-fatal sim-merge family (raise, don't wedge).

    Round-4 bisect on the v5e/axon runtime (scripts/repro_stride16_fault.py
    + scripts/repro_stride16_forward.py): at global_kv_stride=16 on the
    SMALL config (agg_dim 128), the flash kernel at the exact production
    geometry is CLEAN in isolation, merge="stride" (same kernel shapes, no
    similarity glue) runs the full forward CLEAN, and merge="sim" crashes
    the TPU worker into a multi-minute restart loop at the first readback
    — 4/4 across r3+r4. The flagship config (agg_dim 1024) is clean at the
    same stride with the same merge-matrix Pd. The fatal family therefore
    keys on the sim-merge GLUE at narrow widths, not on the attention
    kernel, and until the runtime/XLA fault is fixed upstream this guard
    turns "wedge the chip for 15-40 min" into an immediate, explanatory
    error. Override with VGGT_ALLOW_FATAL_MERGE=1 (e.g. to re-probe on a
    newer runtime); CPU/interpret runs are unaffected (the fault is
    TPU-runtime-specific — the same program passes CPU-mesh parity tests).
    """
    import os
    if backend != "tpu" or os.environ.get("VGGT_ALLOW_FATAL_MERGE") == "1":
        return
    head_dim = cfg.agg_dim // cfg.agg_heads
    # Measured members (each crash = a 15-40 min worker restart loop):
    #   stride>=16, agg_dim<=128, D=32 (r3 3x + r4 bisect 1x + r5 1x —
    #   the r5 crash ran WITH the optimization barriers, so the narrow-
    #   width family is NOT fixed by isolating the glue from fusion);
    #   stride>=8,  agg_dim<=128, D=64 (r4: small64 eval, 2/2 crashes,
    #   while the SAME config at stride 1 ran a full eval sequence clean).
    # Boundary history at agg_dim 256 (r5): the bare forward probed clean
    # at stride 8 AND 16 (evals/results/fence_probe.csv), yet the FULL
    # eval program wedged the worker pre-barrier — the trigger is the
    # glue's fusion context, not width alone. WITH the barriers
    # (_compute_assignment/_kv_map above) width 256 ran the whole
    # 40-sequence composite A/B at stride 8 and 16 clean
    # (evals/results/ab_attention_s256*), so the fence keeps its
    # agg_dim <= 128 boundary only because the barriers are
    # unconditionally in the program now. Clean members bounding the
    # family: stride 8 at D=32 (the whole r3 ab_attention_s8 artifact),
    # barriered agg_dim 256 (81 eval sequences, r5), every
    # agg_dim>=1024 config.
    # All measured crashes ran the flash kernel path around the glue; the
    # chunked-XLA fallback changes the fusion context entirely and is the
    # escape hatch (--attn_impl chunked), so only flash impls are fenced.
    fatal = "flash" in cfg.attn_impl and cfg.agg_dim <= 128 and (
        cfg.global_kv_stride >= 16
        or (cfg.global_kv_stride >= 8 and head_dim >= 64))
    if fatal:
        raise RuntimeError(
            f"global_merge='sim' at global_kv_stride={cfg.global_kv_stride} "
            f"with agg_dim={cfg.agg_dim} (head_dim {head_dim}) is the "
            "measured TPU-worker-fatal family on this runtime (crashes the "
            "worker into a 15-40 min restart loop; see ARCHITECTURE.md §9 "
            "and scripts/repro_stride16_forward.py). Use --global_merge "
            "stride, --attn_impl chunked, a smaller stride, or set "
            "VGGT_ALLOW_FATAL_MERGE=1 to re-probe deliberately.")
