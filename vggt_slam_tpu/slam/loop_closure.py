"""Loop-closure retrieval: global descriptors + best-frame matching.

Counterpart of reference vggt_slam/loop_closure.py: per-frame global
descriptors (SALAD in the reference; here the JAX retrieval model in
models/retrieval.py, or any callable), L2 matching against every older
submap's frames with the current and previous submap excluded
(map.py:38-44), acceptance threshold 0.80, and a bounded queue keeping the
`max_loops` matches. The queue preserves the reference's ordering quirk
(loop_closure.py:39-52: results sorted least-similar first).
"""
from __future__ import annotations

import heapq
from typing import NamedTuple

import numpy as np


class LoopMatch(NamedTuple):
    similarity_score: float
    query_submap_id: int
    query_submap_frame: int
    detected_submap_id: int
    detected_submap_frame: int


class LoopMatchQueue:
    """Bounded heap over similarity score (smaller L2 = more similar).

    Overflow evicts the LEAST similar match; get_matches() returns the
    survivors most-similar first - the same negated-heap construction as the
    reference (loop_closure.py:39-52)."""

    def __init__(self, max_size: int):
        self.max_size = max_size
        self.heap: list = []

    def add(self, match: LoopMatch) -> None:
        if self.max_size <= 0:
            return
        item = (-match.similarity_score, match)
        if len(self.heap) < self.max_size:
            heapq.heappush(self.heap, item)
        else:
            heapq.heappushpop(self.heap, item)

    def get_matches(self):
        return [m for _, m in sorted(self.heap, reverse=True)]


class ImageRetrieval:
    """Descriptor extraction + loop search.

    `descriptor_fn`: callable (S, 3, H, W) float [0,1] -> (S, D) descriptors.
    Defaults to the JAX SALAD-style retrieval model with random init; pass a
    converted-weight model for real place recognition.
    """

    def __init__(self, descriptor_fn=None, input_size: int = 224,
                 batch_bucket: int | None = None,
                 checkpoint: str | None = None):
        self.input_size = input_size
        self.batch_bucket = batch_bucket
        if descriptor_fn is None:
            from vggt_slam_tpu.models.retrieval import default_descriptor_fn
            descriptor_fn = default_descriptor_fn(input_size=input_size,
                                                  checkpoint=checkpoint)
        self.descriptor_fn = descriptor_fn
        # Random-init descriptors land under the 0.80 accept threshold for
        # unrelated images, so an untrusted descriptor source must DISABLE
        # loop detection rather than insert garbage factors (the reference
        # always runs converted SALAD weights - loop_closure.py:80-91).
        self.trusted = bool(getattr(descriptor_fn, "trusted", True))
        self._warned_untrusted = False

    def get_all_submap_embeddings(self, submap) -> np.ndarray:
        frames = np.asarray(submap.get_all_frames(), dtype=np.float32)
        S = frames.shape[0]
        if not self.trusted:
            # Loop detection is disabled; don't pay a descriptor forward
            # per submap for vectors nothing will ever search.
            return np.zeros((S, 1), np.float32)
        if self.batch_bucket is not None and S < self.batch_bucket:
            # Pad to the bucket so the descriptor network compiles once;
            # frames are encoded independently, so padding can't leak.
            pad = np.zeros((self.batch_bucket - S,) + frames.shape[1:],
                           np.float32)
            frames = np.concatenate([frames, pad], axis=0)
        return np.asarray(self.descriptor_fn(frames))[:S]

    def find_loop_closures(self, map, submap, max_similarity_thres: float = 0.80,
                           max_loop_closures: int = 0, skip_last: bool = True):
        """`skip_last` mirrors the reference's previous-submap exclusion
        (map.py:38-44). The pipelined solver passes False because there the
        previous submap is not yet inserted when the search runs - the same
        set of submaps is searched either way."""
        if not self.trusted:
            if not self._warned_untrusted:
                self._warned_untrusted = True
                import sys
                print("loop closure DISABLED: retrieval descriptors are "
                      "random-init (no checkpoint); pass a converted SALAD "
                      "checkpoint to enable place recognition",
                      file=sys.stderr)
            return []
        queue = LoopMatchQueue(max_size=max_loop_closures)
        for query_id, qvec in enumerate(submap.get_all_retrieval_vectors()):
            score, best_submap, best_frame = map.retrieve_best_score_frame(
                qvec, submap.get_id(), ignore_last_submap=skip_last)
            if score < max_similarity_thres:
                queue.add(LoopMatch(score, submap.get_id(), query_id,
                                    best_submap, best_frame))
        return queue.get_matches()
