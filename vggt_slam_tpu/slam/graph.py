"""Pose-graph front API matching the reference's GTSAM wrapper.

Counterpart of reference vggt_slam/graph.py (SL(4)) and graph_se3.py (Pose3
mode used by `--use_sim3`): same method surface - `add_homography`,
`add_between_factor`, `add_prior_factor`, `optimize`, `get_homography`,
`relative_noise` / `anchor_noise`, loop-closure counters - backed by the
jitted on-device LM solver in ops/pose_graph.py instead of C++ GTSAM.

Host-side bookkeeping keeps python lists; `optimize()` pads the graph to
power-of-two bucket capacities so the device program recompiles only
O(log N) times as the SLAM map grows.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vggt_slam_tpu.ops import lie, pose_graph as pg_ops

_DEFAULT_SIGMAS = {
    # reference graph.py:28-29
    "sl4": (0.05, 1e-6),
    # reference graph_se3.py:13-14
    "se3": (0.1, 1e-6),
    "sim3": (0.1, 1e-6),
}


def _next_pow2(n: int, floor: int) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


class PoseGraph:
    """Factor graph over a single manifold type ("sl4", "se3" or "sim3")."""

    def __init__(self, manifold: str = "sl4", dtype=np.float64):
        if manifold not in lie.MANIFOLD_DOF:
            raise ValueError(f"unknown manifold {manifold}")
        self.manifold = manifold
        self.dof = lie.MANIFOLD_DOF[manifold]
        self.dtype = dtype
        rel, anc = _DEFAULT_SIGMAS[manifold]
        self.relative_noise = np.full(self.dof, rel, dtype=dtype)
        self.anchor_noise = np.full(self.dof, anc, dtype=dtype)

        self._key_to_idx: dict[int, int] = {}
        self._values: list[np.ndarray] = []
        self._between: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self._priors: list[tuple[int, np.ndarray, np.ndarray]] = []
        self.initialized_nodes: set[int] = set()
        self.num_loop_closures = 0

    # -- graph construction (reference graph.py:33-55 semantics) ------------

    def _canonicalize(self, H: np.ndarray) -> np.ndarray:
        H = np.asarray(H, dtype=self.dtype)
        if self.manifold == "sl4":
            det = np.linalg.det(H)
            H = H / (np.sign(det) * np.abs(det) ** 0.25)
        return H

    def add_homography(self, key: int, global_h: np.ndarray) -> None:
        """Insert a new node; silently ignores duplicates (graph.py:37-39)."""
        if key in self._key_to_idx:
            return
        self._key_to_idx[key] = len(self._values)
        self._values.append(self._canonicalize(global_h))
        self.initialized_nodes.add(key)

    def add_between_factor(self, key1: int, key2: int, relative_h, noise=None):
        if key1 not in self._key_to_idx or key2 not in self._key_to_idx:
            raise ValueError(
                f"Both poses {key1} and {key2} must exist before adding a factor."
            )
        noise = self.relative_noise if noise is None else np.asarray(noise, self.dtype)
        self._between.append(
            (self._key_to_idx[key1], self._key_to_idx[key2],
             self._canonicalize(relative_h), 1.0 / noise)
        )

    def add_prior_factor(self, key: int, global_h, noise=None):
        if key not in self._key_to_idx:
            raise ValueError(
                f"Trying to add prior factor for key {key} but it is not in the graph."
            )
        noise = self.anchor_noise if noise is None else np.asarray(noise, self.dtype)
        self._priors.append(
            (self._key_to_idx[key], self._canonicalize(global_h), 1.0 / noise)
        )

    # -- solve ---------------------------------------------------------------

    def _build_arrays(self) -> pg_ops.GraphArrays:
        n = len(self._values)
        e = max(len(self._between), 1)
        p = max(len(self._priors), 1)
        # Bucket floors of 64 nodes / 128 factors: every new (N, E, P)
        # combination costs ~10 s of LM tracing (host python, per process)
        # plus a compile the first time it appears, and small-floor buckets
        # made a typical 10-submap run recompile 3-4 times. A 64-node dense
        # solve is only ~30 ms slower than an 8-node one (bench: 53 ms), so
        # one program covers runs up to 64 submaps and growth is rare
        # beyond it.
        N = _next_pow2(n, 64)
        E = _next_pow2(e, 128)
        P = _next_pow2(p, 4)
        dt = self.dtype

        values = np.tile(np.eye(4, dtype=dt), (N, 1, 1))
        values[:n] = np.stack(self._values)
        node_mask = np.zeros(N, dtype=bool)
        node_mask[:n] = True

        bet_i = np.zeros(E, dtype=np.int32)
        bet_j = np.zeros(E, dtype=np.int32)
        bet_meas = np.tile(np.eye(4, dtype=dt), (E, 1, 1))
        bet_si = np.ones((E, self.dof), dtype=dt)
        bet_mask = np.zeros(E, dtype=bool)
        for k, (i, j, Z, si) in enumerate(self._between):
            bet_i[k], bet_j[k], bet_meas[k], bet_si[k], bet_mask[k] = i, j, Z, si, True

        pri_node = np.zeros(P, dtype=np.int32)
        pri_meas = np.tile(np.eye(4, dtype=dt), (P, 1, 1))
        pri_si = np.ones((P, self.dof), dtype=dt)
        pri_mask = np.zeros(P, dtype=bool)
        for k, (i, Z, si) in enumerate(self._priors):
            pri_node[k], pri_meas[k], pri_si[k], pri_mask[k] = i, Z, si, True

        return pg_ops.GraphArrays(
            values=jnp.asarray(values), node_mask=jnp.asarray(node_mask),
            bet_i=jnp.asarray(bet_i), bet_j=jnp.asarray(bet_j),
            bet_meas=jnp.asarray(bet_meas), bet_sqrt_info=jnp.asarray(bet_si),
            bet_mask=jnp.asarray(bet_mask),
            pri_node=jnp.asarray(pri_node), pri_meas=jnp.asarray(pri_meas),
            pri_sqrt_info=jnp.asarray(pri_si), pri_mask=jnp.asarray(pri_mask),
        )

    def optimize(self) -> float:
        """LM-optimize all node values in place; returns final 0.5*||r||^2."""
        if not self._values:
            return 0.0
        arrays = self._build_arrays()
        values, err = pg_ops.optimize(arrays, manifold=self.manifold)
        values = np.asarray(values)
        for k in range(len(self._values)):
            self._values[k] = values[k]
        return float(err)

    # -- queries (reference graph.py:57-86) ----------------------------------

    def get_homography(self, node_id: int) -> np.ndarray:
        return np.array(self._values[self._key_to_idx[node_id]])

    def print_estimates(self) -> None:
        for key in sorted(self.initialized_nodes):
            print(f"Homography {key}:\n{self.get_homography(key)}\n")

    def increment_loop_closure(self) -> None:
        self.num_loop_closures += 1

    def get_num_loops(self) -> int:
        return self.num_loop_closures
