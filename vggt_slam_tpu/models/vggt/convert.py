"""Checkpoint I/O + torch->JAX weight conversion harness for VGGT.

The released `facebook/VGGT-1B` torch checkpoint (reference main.py:68)
cannot be fetched in this environment (no egress), so the converter is a
best-effort name-mapping harness: it loads a torch state dict with the CPU
torch that is available here, walks our flax parameter tree, and fills every
leaf whose mapped torch tensor exists and matches in shape; anything
unmatched is reported loudly. Validate layer-by-layer against the torch
model before trusting converted weights (SURVEY.md section 7 "hard parts").

Flax checkpoints save/load as a flat npz keyed by parameter path.
"""
from __future__ import annotations

import re

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# Flat npz checkpoints (our native format)
# ----------------------------------------------------------------------------

def _flatten(params):
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    return flat


def save_checkpoint(params, path: str) -> None:
    np.savez(path, **_flatten(params))


def load_checkpoint(path: str, params_template):
    """Load a flat npz checkpoint into the structure of `params_template`."""
    data = np.load(path)
    missing, extra = [], set(data.files)

    def fill(prefix, node):
        if isinstance(node, dict):
            return {k: fill(f"{prefix}/{k}" if prefix else k, v)
                    for k, v in node.items()}
        if prefix in data.files:
            extra.discard(prefix)
            arr = data[prefix]
            if arr.shape != tuple(node.shape):
                raise ValueError(f"shape mismatch at {prefix}: "
                                 f"{arr.shape} vs {tuple(node.shape)}")
            return jnp.asarray(arr, dtype=node.dtype)
        missing.append(prefix)
        return node

    out = fill("", params_template)
    if missing:
        print(f"[checkpoint] WARNING: {len(missing)} params missing from "
              f"{path} (kept init): {missing[:5]}...")
    if extra:
        print(f"[checkpoint] WARNING: {len(extra)} unused arrays in {path}")
    return out


# ----------------------------------------------------------------------------
# Torch -> flax mapping
# ----------------------------------------------------------------------------

def allowed_unused_vggt(key: str) -> bool:
    """Checkpoint keys the converter legitimately drops: DINOv2's unused
    mask_token, the aggregator's resnet-normalization buffers (folded
    into preprocessing here), DPT's famously-dead refinenet4.resConfUnit1
    (never called in the reference forward), and the tracking head (out
    of SLAM scope, SURVEY §2.2). Shared by the manifest coverage test and
    the 1B load rehearsal so the allowlist has one source of truth."""
    return (key == "aggregator.patch_embed.mask_token"
            or key.startswith("aggregator._resnet_")
            or ".scratch.refinenet4.resConfUnit1." in key
            or key.startswith("track_head."))


def _torch_name_candidates(flax_path: str) -> list[str]:
    """Map one flax param path to the public facebookresearch/vggt
    state-dict name.

    Works on a fully dot-separated path with leaf suffixes renamed FIRST
    (kernel/scale -> weight), then digit-anchored module renames - ordered
    slash-by-slash string replacement (the round-1 version) consumed
    separators needed by later rules and silently left norm/mlp leaves
    unmatched (caught by tests/test_model_torch_parity.py).
    """
    p = flax_path
    if p.startswith("params/"):
        p = p[len("params/"):]
    p = p.replace("/", ".")
    # leaf renames
    p = re.sub(r"\.kernel$", ".weight", p)
    p = re.sub(r"\.scale$", ".weight", p)
    # numbered module lists (digit-anchored: trunk_0 yes, trunk_norm no)
    p = re.sub(r"\bframe_block_(\d+)", r"frame_blocks.\1", p)
    p = re.sub(r"\bglobal_block_(\d+)", r"global_blocks.\1", p)
    p = re.sub(r"\bblock_(\d+)", r"blocks.\1", p)      # DINOv2 encoder
    p = re.sub(r"\btrunk_(\d+)", r"trunk.\1", p)       # camera-head trunk
    # camera head (vggt camera_head.py layout)
    p = p.replace(".modulation.", ".poseLN_modulation.1.")
    # DPT heads (vggt dpt_head.py / Depth-Anything layout)
    p = re.sub(r"\bprojects_(\d+)", r"projects.\1", p)
    p = re.sub(r"\bresize_(\d+)", r"resize_layers.\1", p)
    p = re.sub(r"\blayer_rn_(\d+)",
               lambda m: f"scratch.layer{int(m.group(1)) + 1}_rn", p)
    p = re.sub(r"\brefinenet(\d+)", r"scratch.refinenet\1", p)
    p = p.replace(".output_conv1.", ".scratch.output_conv1.")
    p = p.replace(".output_conv2_0.", ".scratch.output_conv2.0.")
    p = p.replace(".output_conv2_2.", ".scratch.output_conv2.2.")
    # DINOv2 patchify conv lives under .proj in torch
    p = p.replace("patch_embed.patch_embed.", "patch_embed.patch_embed.proj.")
    return [p]


def _structural_transforms(flat_t: dict) -> None:
    """Reshape torch arrays whose LAYOUT differs from ours, in place.

    DINOv2 stores `pos_embed` as (1, 1+g*g, C): one CLS position followed by
    a flattened square patch grid, and adds slot 0 to the CLS token at
    forward time (registers get no position). Our DinoViT keeps a (1,g,g,C)
    grid and no CLS position parameter - so the CLS slot is FOLDED INTO
    cls_token here and the patch slots are reshaped to the grid. Without
    this the generic name mapping leaves both parameters at random init
    (shapes don't match) for any real DINOv2-family checkpoint.
    """
    # Aggregator special tokens: the released VGGT stores camera_token as
    # (1, 2, 1, C) and register_token as (1, 2, R, C) (leading broadcast
    # dim; index 0 = frame 0's params, 1 = all other frames'). Our flax
    # params drop the leading 1: (2, 1, C) / (2, R, C). Caught by the
    # full-scale manifest test (tests/test_convert_manifest.py).
    for key in ("aggregator.camera_token", "aggregator.register_token"):
        arr = flat_t.get(key)
        if arr is not None and arr.ndim == 4 and arr.shape[0] == 1 \
                and arr.shape[1] == 2:
            flat_t[key] = arr[0]

    for key in list(flat_t):
        if not key.endswith("pos_embed"):
            continue
        arr = flat_t[key]
        if arr.ndim != 3 or arr.shape[0] != 1:
            continue
        n, C = arr.shape[1] - 1, arr.shape[2]
        g = int(round(n ** 0.5))
        if g * g != n:
            continue
        cls_key = key[: -len("pos_embed")] + "cls_token"
        if cls_key in flat_t:
            flat_t[cls_key] = flat_t[cls_key] + arr[:, :1]
        flat_t[key] = arr[:, 1:].reshape(1, g, g, C)
    _rope_pairing_transforms(flat_t)


def _rope_pairing_transforms(flat_t: dict) -> None:
    """Permute q/k head dims of ROPED blocks to our rope pairing, in place.

    The released VGGT applies croco-style 2D rotary embedding: the head dim
    splits into a y half and an x half, and rotate_half pairs dim i with
    i + Dh/4 WITHIN each half. Our kernels rotate pairs (i, i + Dh/2)
    across the full head dim with angle table [y-angles | x-angles]
    (ops/attention._rope_in_kernel, modules.apply_rope) - the same math
    under the fixed per-head quarter permutation [q0, q2, q1, q3] of q/k
    feature dims. Attention scores are invariant when q and k (and their
    per-head q_norm/k_norm params) are permuted consistently, so the
    permutation is folded into the parameters here and the hot path keeps
    its single-swap rope form. Applies ONLY to blocks that use rope: the
    aggregator's frame/global blocks (the DINOv2 encoder uses learned
    position embeddings and the camera-head trunk has no rope).

    Torch-golden: tests/test_model_torch_parity.py compares a converted
    croco-rope torch block against our forward end to end.
    """
    pat = re.compile(r"(frame|global)_blocks\.\d+\.attn\.")

    def quarter_perm(n):
        q = n // 4
        idx = np.arange(n)
        return np.concatenate([idx[:q], idx[2 * q:3 * q],
                               idx[q:2 * q], idx[3 * q:]])

    for key in list(flat_t):
        m = pat.search(key)
        if m is None:
            continue
        arr = flat_t[key]
        tail = key[m.end():]
        if tail in ("q_norm.weight", "q_norm.bias",
                    "k_norm.weight", "k_norm.bias"):
            flat_t[key] = arr[quarter_perm(arr.shape[0])]
        elif tail in ("qkv.weight", "qkv.bias"):
            # torch qkv rows: (3*C, ...) = q rows, k rows, v rows. Head
            # count isn't in the shapes, but head_dim is: the per-head
            # q_norm of the same block. Skip (leave torch layout) if the
            # block has no qk-norm - no released roped VGGT block lacks it.
            norm_key = key[: m.end()] + "q_norm.weight"
            if norm_key not in flat_t:
                continue
            dh = flat_t[norm_key].shape[0]
            C = arr.shape[0] // 3
            perm = quarter_perm(dh)
            rows = np.arange(arr.shape[0])
            qk = rows[: 2 * C].reshape(2, C // dh, dh)[..., perm].reshape(-1)
            flat_t[key] = arr[np.concatenate([qk, rows[2 * C:]])]


def convert_torch_state_dict(state_dict: dict, params_template):
    """Fill a flax VGGT param tree from a torch state dict.

    Conv kernels are transposed OIHW->HWIO; linear kernels (out,in)->(in,out);
    DINOv2 pos_embed/cls_token layouts are re-structured first
    (`_structural_transforms`). Returns (params, report) where report lists
    unmatched flax paths and unused torch keys.
    """
    def _to_numpy(v):
        # torch refuses tensor.numpy() on bf16 — and the released
        # facebook/VGGT-1B checkpoint stores bf16 (found by the r4 1B
        # load rehearsal, scripts/rehearse_1b_load.py). Upcast to f32
        # (exact for bf16); load_checkpoint re-casts to the template's
        # param dtype anyway.
        if hasattr(v, "detach"):
            v = v.detach().cpu()
            try:
                return v.numpy()
            except TypeError:
                return v.float().numpy()
        return np.asarray(v)

    flat_t = {k: _to_numpy(v) for k, v in state_dict.items()}
    _structural_transforms(flat_t)
    used = set()
    unmatched = []

    def fill(prefix, node):
        if isinstance(node, dict):
            return {k: fill(f"{prefix}/{k}" if prefix else k, v)
                    for k, v in node.items()}
        shape = tuple(node.shape)
        for cand in _torch_name_candidates(prefix):
            if cand not in flat_t:
                continue
            arr = flat_t[cand]
            # Only `.weight` tensors are conv/linear kernels needing the
            # torch->flax transpose; other 4D/2D arrays (e.g. the re-gridded
            # pos_embed from _structural_transforms) are layout-matched as is.
            if cand.endswith(".weight"):
                if arr.ndim == 4 and (".resize_layers.0." in cand or
                                      ".resize_layers.1." in cand):
                    # ConvTranspose2d stores (in, out, k, k); our upsample
                    # kernel is (k, k, in, out).
                    arr = arr.transpose(2, 3, 0, 1)
                elif arr.ndim == 4 and len(shape) == 4:  # conv OIHW -> HWIO
                    arr = arr.transpose(2, 3, 1, 0)
                elif arr.ndim == 2 and len(shape) == 2:  # (out,in)->(in,out)
                    arr = arr.T
            if arr.shape == shape:
                used.add(cand)
                return jnp.asarray(arr, dtype=node.dtype)
        unmatched.append(prefix)
        return node

    params = fill("", params_template)
    unused = sorted(set(flat_t) - used)
    return params, {"unmatched_flax": unmatched, "unused_torch": unused}


def convert_torch_checkpoint(torch_path: str, params_template, out_path: str):
    """CLI helper: model.pt -> flat npz in our layout, with a match report."""
    import torch

    sd = torch.load(torch_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    params, report = convert_torch_state_dict(sd, params_template)
    n_un = len(report["unmatched_flax"])
    n_tu = len(report["unused_torch"])
    print(f"[convert] unmatched flax params: {n_un}; unused torch keys: {n_tu}")
    for p in report["unmatched_flax"][:20]:
        print("  missing:", p)
    save_checkpoint(params, out_path)
    return report
