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

def _torch_name_candidates(flax_path: str) -> list[str]:
    """Map one flax param path to candidate torch state-dict names.

    Best-effort against the public facebookresearch/vggt naming; every rule
    returns candidates in priority order.
    """
    p = flax_path

    # encoder (DINOv2 inside the aggregator's patch_embed)
    p = p.replace("params/aggregator/patch_embed/", "aggregator.patch_embed.")
    p = p.replace("params/aggregator/frame_block_", "aggregator.frame_blocks.")
    p = p.replace("params/aggregator/global_block_", "aggregator.global_blocks.")
    p = p.replace("params/aggregator/camera_token", "aggregator.camera_token")
    p = p.replace("params/aggregator/register_token", "aggregator.register_token")
    p = p.replace("params/camera_head/", "camera_head.")
    p = p.replace("params/depth_head/", "depth_head.")
    p = p.replace("params/point_head/", "point_head.")
    p = p.replace("block_", "blocks.")
    # Camera head (vggt camera_head.py layout)
    p = p.replace("/trunk_", ".trunk.")
    p = p.replace("/modulation/", ".poseLN_modulation.1.")
    # DPT heads (vggt dpt_head.py / Depth-Anything layout)
    p = p.replace("/projects_", ".projects.")
    p = p.replace("/resize_", ".resize_layers.")
    p = re.sub(r"/layer_rn_(\d+)",
               lambda m: f".scratch.layer{int(m.group(1)) + 1}_rn", p)
    p = re.sub(r"/refinenet(\d+)", r".scratch.refinenet\1", p)
    p = p.replace("/output_conv1/", ".scratch.output_conv1.")
    p = p.replace("/output_conv2_0/", ".scratch.output_conv2.0.")
    p = p.replace("/output_conv2_2/", ".scratch.output_conv2.2.")
    p = p.replace("/attn/qkv/", ".attn.qkv.")
    p = p.replace("/attn/proj/", ".attn.proj.")
    p = p.replace("/mlp/fc1/", ".mlp.fc1.")
    p = p.replace("/mlp/fc2/", ".mlp.fc2.")
    p = p.replace("/norm1/", ".norm1.").replace("/norm2/", ".norm2.")
    p = p.replace("/ls1/gamma", ".ls1.gamma").replace("/ls2/gamma", ".ls2.gamma")
    p = p.replace("/norm/", ".norm.")
    p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
    p = p.replace("/scale", ".weight")
    p = p.replace("patch_embed.patch_embed", "patch_embed.patch_embed.proj")
    p = p.replace("/", ".")
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


def convert_torch_state_dict(state_dict: dict, params_template):
    """Fill a flax VGGT param tree from a torch state dict.

    Conv kernels are transposed OIHW->HWIO; linear kernels (out,in)->(in,out);
    DINOv2 pos_embed/cls_token layouts are re-structured first
    (`_structural_transforms`). Returns (params, report) where report lists
    unmatched flax paths and unused torch keys.
    """
    flat_t = {k: np.asarray(v) for k, v in state_dict.items()}
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
