"""Gradio demo: zip of images -> SLAM -> downloadable .glb scene.

Counterpart of reference app.py (HF Spaces demo, app.py:16-112): upload a
zip, run the solver in gradio mode with sliders for submap size / max loops
/ min disparity / conf threshold, export the fused point cloud + camera
axes as a .glb via the in-repo exporter (no trimesh). `gradio` is optional;
without it the module still exposes `run_slam()` for programmatic use.
"""
from __future__ import annotations

import os
import tempfile
import zipfile

import numpy as np


def run_slam(zip_path: str, submap_size: int = 16, max_loops: int = 1,
             min_disparity: float = 50.0, conf_threshold: float = 25.0,
             model_size: str = "tiny", checkpoint: str | None = None) -> str:
    """Run SLAM over a zip of images; returns the path of an exported .glb."""
    import cv2

    from vggt_slam_tpu.data.images import list_image_folder
    from vggt_slam_tpu.slam.solver import Solver
    from vggt_slam_tpu.viz.glb import GLBExporter

    workdir = tempfile.mkdtemp(prefix="vggt_slam_")
    img_dir = os.path.join(workdir, "images")
    os.makedirs(img_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            base = os.path.basename(name)
            if base and base.lower().endswith((".jpg", ".jpeg", ".png")):
                with open(os.path.join(img_dir, base), "wb") as f:
                    f.write(zf.read(name))

    names = list_image_folder(img_dir)
    if not names:
        raise ValueError("no images found in the uploaded zip")

    import argparse

    from vggt_slam_tpu.main import build_model_fn
    args = argparse.Namespace(model_size=model_size, checkpoint=checkpoint,
                              submap_size=submap_size,
                              overlapping_window_size=1, max_loops=max_loops)
    model_fn = build_model_fn(args)
    solver = Solver(init_conf_threshold=conf_threshold)

    subset = []
    for name in names:
        img = cv2.imread(name)
        if solver.flow_tracker.compute_disparity(img, min_disparity):
            subset.append(name)
        if len(subset) == submap_size + 1 or (name == names[-1] and len(subset) > 1):
            preds = solver.run_predictions(subset, model_fn, max_loops)
            solver.add_points(preds)
            solver.graph.optimize()
            solver.map.update_submap_homographies(solver.graph)
            subset = subset[-1:]

    exporter = GLBExporter()
    for submap in solver.map.ordered_submaps_by_key():
        exporter.add_point_cloud(
            submap.get_points_in_world_frame(stride=2),
            submap.get_points_colors(stride=2))
        for pose in submap.get_all_poses_world(ignore_loop_closure_frames=True):
            exporter.add_camera_pose(pose)
    out = os.path.join(workdir, "scene.glb")
    exporter.export(out)
    return out


def build_demo():
    import gradio as gr

    with gr.Blocks(title="TPU VGGT-SLAM") as demo:
        gr.Markdown("# VGGT-SLAM (TPU)\nUpload a zip of images; get a 3D scene.")
        with gr.Row():
            zip_in = gr.File(label="images.zip", type="filepath")
            glb_out = gr.Model3D(label="Reconstruction")
        with gr.Row():
            submap = gr.Slider(4, 32, value=16, step=1, label="submap size")
            loops = gr.Slider(0, 5, value=1, step=1, label="max loops")
            disp = gr.Slider(0, 150, value=50, label="min disparity (px)")
            conf = gr.Slider(0, 90, value=25, label="conf percentile")
        btn = gr.Button("Run SLAM")
        btn.click(lambda z, s, l, d, c: run_slam(z, int(s), int(l), d, c),
                  inputs=[zip_in, submap, loops, disp, conf],
                  outputs=[glb_out])
    return demo


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; use run_slam() directly or "
                         "the CLI (python -m vggt_slam_tpu.main)")
    build_demo().launch(server_name="0.0.0.0")
