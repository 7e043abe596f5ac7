"""VGGT model configuration.

Architecture parameters follow the VGGT paper (arXiv 2503.11651; PAPERS.md)
and the usage evidenced in the reference SLAM (SURVEY.md section 2.2): a
DINOv2 ViT-L/14 image encoder feeding 24 alternating frame/global attention
blocks, a camera head emitting a 9-D pose encoding, and DPT-style fusion
heads for depth / point maps with per-pixel confidence. `tiny()` is a
CPU-testable configuration with identical structure.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    img_size: int = 518
    patch_size: int = 14

    # DINOv2-style image encoder (ViT-L/14 w/ registers)
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    enc_mlp_ratio: int = 4
    enc_num_registers: int = 4
    enc_layerscale: float = 1e-5

    # Alternating-attention aggregator
    agg_dim: int = 1024
    agg_depth: int = 24          # pairs of (frame, global) blocks
    agg_heads: int = 16
    agg_mlp_ratio: int = 4
    agg_layerscale: float = 0.01
    # Per-head LayerNorm on q/k in the aggregator's attention (the released
    # VGGT-1B builds its alternating blocks with qk_norm=True; the DINOv2
    # encoder and the camera-head trunk do not use it).
    agg_qk_norm: bool = True
    num_register_tokens: int = 4  # per-frame register tokens (+1 camera token)
    rope_base: float = 100.0

    # Camera head
    cam_trunk_depth: int = 4
    cam_iterations: int = 4

    # DPT heads
    dpt_layers: Tuple[int, ...] = (4, 11, 17, 23)  # captured aggregator depths
    dpt_features: int = 256
    dpt_out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)

    # Compute
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "chunked"       # "flash" on TPU hot path
    enable_point_head: bool = True
    enable_depth_head: bool = True

    # Global-attention K/V token merging (FastVGGT-style, PAPERS.md:8):
    # keys/values of global blocks keep ALL tokens of frame 0 plus one K/V
    # slot per `global_kv_stride` patch tokens of the other frames (special
    # tokens always kept); queries stay dense so every output token is
    # produced. 1 = exact attention. >1 trades accuracy for an
    # ~stride-fold cut of the dominant O((S*P)^2) cost.
    global_kv_stride: int = 1
    # How the reduced K/V set is formed when global_kv_stride > 1:
    #   "sim":    ToMe-style similarity merging (FastVGGT's method): each
    #             dropped patch token merges into its most-similar kept
    #             token of the SAME frame (weighted mean + log-size
    #             proportional-attention bias); the assignment is computed
    #             once at the first global block and shared by all 24.
    #   "stride": plain subsampling - dropped tokens simply vanish
    #             (round-1 behavior, kept for comparison).
    global_merge: str = "sim"
    # int8 QK^T in the GLOBAL attention blocks (flash impl only): q/k tiles
    # quantize to int8 in-kernel (per-(batch,head) scales) and the logits
    # matmul runs on the MXU's 2x-rate int8 path. Attention stays full-rank
    # (every token attends to every token) - a numerics choice like bf16,
    # not a sparsification. OFF by default: the isolated-kernel probe's
    # ~12% win (scripts/bench_int8_inkernel.py) does NOT transfer to the
    # production kernel (in-kernel rope + masking + per-key bias make it
    # VPU-bound, and dequant adds a per-logit multiply) - end-to-end A/B on
    # the same revision measured exact 12.18 vs 12.64 FPS (int8 SLOWER by
    # 3.6%) and merged 20.44 vs 20.20 (+1.2%, not worth the extra ~1e-3
    # logit error). Kept as a tested opt-in (--qk_int8).
    global_qk_int8: bool = False
    # Flash-softmax variant for the GLOBAL attention blocks: "static"
    # replaces the kernel's running-max pass with a precomputed
    # Cauchy-Schwarz logit bound (sound here because agg_qk_norm holds, so
    # q/k row norms are uniform; softmax stays exact to f32 - see
    # ops/attention.flash_attention). One fewer VPU pass over every logits
    # tile of the 24 global blocks; same-session A/B on the v5e measured
    # merged 19.95 -> 21.97 FPS and exact 11.68 -> 12.53 FPS (ARCHITECTURE
    # section 9). "online" restores the classic running-max kernel.
    global_softmax: str = "static"
    # Sequence-parallel GLOBAL attention: set to a jax.sharding.Mesh (with
    # `global_seq_axis` naming its frame/token axis) to run the exact
    # global-attention path as ring attention - tokens stay sharded,
    # K/V chunks rotate via ppermute over ICI (parallel/ring.py) instead
    # of XLA all-gathering the full sequence onto every chip. Ignored by
    # the merged (global_kv_stride > 1) path, whose 4x-smaller K/V set is
    # cheap to all-gather. Wired by parallel.infer (seq_parallel=True).
    global_seq_mesh: object = None
    global_seq_axis: str = "dp"
    # Gradient checkpointing (training): wrap every encoder/frame/global
    # transformer block in nn.remat, so the backward pass recomputes block
    # activations instead of keeping all 72 blocks' intermediates live -
    # the classic HBM-for-FLOPs trade (activations are the dominant
    # training-memory term at real shapes; params/optimizer memory is the
    # ZeRO-1 step's job). Inference ignores it (no grads -> XLA keeps
    # nothing anyway). Global blocks skip remat when K/V merging is on
    # (global_kv_stride > 1): the shared ToMe kv_map closure is a
    # non-array argument jax.checkpoint can't thread; training uses exact
    # attention anyway (see parallel/pp.py).
    remat: bool = False

    @property
    def tokens_per_frame_special(self) -> int:
        return 1 + self.num_register_tokens  # camera + registers

    def patch_grid(self, H: int, W: int) -> tuple[int, int]:
        return H // self.patch_size, W // self.patch_size

    @staticmethod
    def vggt_1b(**overrides) -> "VGGTConfig":
        """Full-size configuration matching facebook/VGGT-1B."""
        return VGGTConfig(**overrides)

    @staticmethod
    def small(**overrides) -> "VGGTConfig":
        """Small-but-real configuration: same structure as VGGT-1B at
        ~1/8 width and ~1/4 depth. Big enough to learn real geometry from
        the synthetic 3D generator (tools/train_tiny.py) - which makes the
        eval-harness ATE accuracy-bearing in this no-egress environment -
        yet small enough to train on one chip in hours."""
        base = dict(
            enc_dim=128, enc_depth=4, enc_heads=4,
            agg_dim=128, agg_depth=6, agg_heads=4,
            cam_trunk_depth=2, cam_iterations=4,
            dpt_layers=(1, 3, 5), dpt_features=64,
            dpt_out_channels=(64, 128, 128),
        )
        base.update(overrides)
        return VGGTConfig(**base)

    @staticmethod
    def small64(**overrides) -> "VGGTConfig":
        """small() at the flagship HEAD-DIM: same widths/depths, but 2
        heads instead of 4, so every attention runs D=64 — the head dim of
        the 1B flagship (1024/16) and therefore the exact packed-layout
        kernel geometry (hp=128/D=2 head groups, production block shapes)
        the headline bench ships. Exists so the merged-vs-exact ATE A/B
        (evals/ab_attention) measures merging at the kernel shapes that
        matter, not at the D=32 the plain small() config happens to have
        (VERDICT round-3 item 1). FLOP cost is identical to small()."""
        base = dict(enc_heads=2, agg_heads=2)
        base.update(overrides)
        return VGGTConfig.small(**base)

    @staticmethod
    def small256(**overrides) -> "VGGTConfig":
        """small() widened to agg_dim/enc_dim 256 at 4 heads -> D=64, the
        flagship head-dim, OUTSIDE the measured worker-fatal sim-merge
        family (which covers agg_dim <= 128; ARCHITECTURE section 9 /
        aggregator._check_fatal_merge_family). Exists so the SHIPPED
        composite operating point — flash impl + sim merge stride 8 +
        static-max softmax — can be A/B'd end-to-end at D=64 on the chip
        (VERDICT round-4 item 1): the only other trained D=64 width
        (small64, agg_dim 128) is inside the fence, which forced round 4
        to isolate the knobs separately under chunked XLA. 4x small64's
        linear FLOPs, 2x its attention FLOPs (4 heads vs 2)."""
        base = dict(
            enc_dim=256, enc_depth=4, enc_heads=4,
            agg_dim=256, agg_depth=6, agg_heads=4,
            cam_trunk_depth=2, cam_iterations=4,
            dpt_layers=(1, 3, 5), dpt_features=64,
            dpt_out_channels=(64, 128, 128),
        )
        base.update(overrides)
        return VGGTConfig(**base)

    @staticmethod
    def tiny(**overrides) -> "VGGTConfig":
        base = dict(
            img_size=56, patch_size=14,
            enc_dim=32, enc_depth=2, enc_heads=2,
            agg_dim=32, agg_depth=4, agg_heads=2,
            cam_trunk_depth=2, cam_iterations=2,
            dpt_layers=(1, 3), dpt_features=16, dpt_out_channels=(16, 32),
            dtype=jnp.float32,
        )
        base.update(overrides)
        return VGGTConfig(**base)
