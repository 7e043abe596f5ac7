"""Device mesh + sharding rules for multi-chip VGGT.

The reference is single-GPU (SURVEY.md section 2.4: no distributed backend),
so multi-chip here is a TPU-native addition, not a port: a ("dp", "tp") mesh
where
  * dp shards the frame axis S - frame attention, the encoder, and the DPT
    heads are embarrassingly parallel over frames; XLA inserts the
    all-gather at the global-attention block where frames must mix;
  * tp shards attention heads / MLP hidden dims of every transformer block
    (Megatron-style: column-parallel qkv/fc1, row-parallel proj/fc2), with
    psum on the row-parallel outputs inserted by XLA from the shardings.

Collectives ride ICI inside a pod slice; nothing here touches DCN.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, tp: int | None = None) -> Mesh:
    """Create a ("dp", "tp") mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_pp_mesh(devices=None, pp: int = 2) -> Mesh:
    """Create a ("pp", "dp") mesh for the pipeline-parallel training step
    (parallel/pp.py): pp shards the aggregator's depth axis into stages,
    dp shards scenes; tp's collectives would need manual Megatron psums
    inside the pipeline's shard_map, so the pp step composes pp x dp only."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % pp == 0, f"{n} devices not divisible by pp={pp}"
    arr = np.asarray(devices).reshape(pp, n // pp)
    return Mesh(arr, axis_names=("pp", "dp"))


# Partition rules by parameter path suffix (flax param tree paths).
# Column-parallel: shard output features; row-parallel: shard input features.
_RULES: list[tuple[str, P]] = [
    (r"attn/qkv/kernel$", P(None, "tp")),
    (r"attn/qkv/bias$", P("tp")),
    (r"attn/proj/kernel$", P("tp", None)),
    (r"mlp/fc1/kernel$", P(None, "tp")),
    (r"mlp/fc1/bias$", P("tp")),
    (r"mlp/fc2/kernel$", P("tp", None)),
]


def param_spec(path: str, leaf) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path):
            # Guard: tiny dims may not divide the tp axis; replicate then.
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def make_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a flax param dict under the TP rules.

    Falls back to replication for any tensor whose sharded dim doesn't
    divide the tp axis size (keeps tiny test configs valid on any mesh).
    """
    tp = mesh.shape["tp"]

    def one(path, leaf):
        spec = param_spec(_path_str(path), leaf)
        for dim, name in enumerate(spec):
            if name == "tp" and leaf.shape[dim] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def frame_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard a tensor whose frame axis is `axis` over dp (axis 0 for the
    usual (S, ...) tensors; axis 1 for channel-first (3, S, H, W) maps)."""
    return NamedSharding(mesh, P(*([None] * axis + ["dp"])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
