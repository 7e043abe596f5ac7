"""Text-query a saved semantic voxel map.

Counterpart of reference vggt_slam/query_voxelmap.py: load a voxel map
directory (semantic_voxels.npz + frame_names.json), embed the text query,
retrieve the top-k most similar voxels by dot product, report/copy the
latest contributing frame, and (optionally) highlight in viser.

CLI: python -m vggt_slam_tpu.tools.query_voxelmap --voxel_dir ... \
        --query "a chair" [--clip_model_dir ...] [--image_dir ...]
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from vggt_slam_tpu.semantic.voxel_map import SemanticVoxelMap


def text_embedding(query: str, dim: int, clip_model_dir: str | None,
                   clip_backend: str = "auto"):
    if clip_model_dir:
        from vggt_slam_tpu.semantic.embedder import resolve_clip_encoders
        _, encode_text = resolve_clip_encoders(clip_model_dir, clip_backend)
        return encode_text([query])[0]
    # Fallback: deterministic hashed bag-of-words embedding (pairs with the
    # color-hash image fallback only in the sense of being a valid vector;
    # real text->image retrieval needs the CLIP checkpoint).
    rng = np.random.default_rng(abs(hash(query)) % (2 ** 31))
    v = rng.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def main():
    p = argparse.ArgumentParser(description="Query a semantic voxel map")
    p.add_argument("--voxel_dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--top_k", type=int, default=1)
    p.add_argument("--clip_model_dir", default=None)
    p.add_argument("--clip_backend", default="auto",
                   choices=["auto", "native", "hf"])
    p.add_argument("--image_dir", default=None,
                   help="if given, copy the retrieved frame image here")
    p.add_argument("--out_dir", default="query_results")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--voxel_port", type=int, default=8081)
    args = p.parse_args()

    vm = SemanticVoxelMap.load_from_directory(args.voxel_dir)
    d = vm.get_features().shape[-1]
    qe = text_embedding(args.query, d, args.clip_model_dir,
                        args.clip_backend)
    idx, coords, sims = vm.query_with_embedding(qe, top_k=args.top_k)
    print(f"query: {args.query!r}")
    for rank, (i, c, s) in enumerate(zip(idx, coords, sims)):
        name, sid, fid = vm.get_latest_frame_at_voxel(i)
        center = vm.get_centers_world()[i]
        print(f"  #{rank}: voxel {i} coord {tuple(int(x) for x in c)} "
              f"center {np.round(center, 3).tolist()} sim {s:.4f} "
              f"frame {name} (submap {sid}, frame_id {fid})")
        if args.image_dir and name:
            src = os.path.join(args.image_dir, name)
            if os.path.exists(src):
                os.makedirs(args.out_dir, exist_ok=True)
                shutil.copy(src, os.path.join(args.out_dir,
                                              f"rank{rank}_{name}"))

    if args.visualize:
        vm.visualize(port=args.voxel_port, color_mode="query",
                     query_voxel_indices=idx)


if __name__ == "__main__":
    main()
