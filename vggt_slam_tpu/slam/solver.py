"""SLAM orchestration: perception -> registration -> factor graph, per submap.

Counterpart of the reference `Solver` (vggt_slam/solver.py:139-482) with the
same two-phase per-submap flow:

  run_predictions(): preprocess -> retrieval descriptors -> loop detection ->
      append retrieved loop frames to the batch -> VGGT forward -> pose
      decode (solver.py:414-482)
  add_points(): depth unprojection, inter-submap registration (Sim(3) scale
      propagation or SL(4) RANSAC), factor insertion, loop-closure factors
      (solver.py:226-388)

Differences by design: the model is injected as a callable returning the
prediction dict (so tests run a deterministic fake VGGT), visualization is an
optional pluggable viewer instead of a hard viser dependency, and all hot
math (RANSAC, unprojection, pose readout, graph solve) runs on device.
"""
from __future__ import annotations

import contextlib
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vggt_slam_tpu.data.images import load_and_preprocess_images
from vggt_slam_tpu.ops import geometry
from vggt_slam_tpu.ops.homography import ransac_projective
from vggt_slam_tpu.slam.graph import PoseGraph
from vggt_slam_tpu.slam.keyframe import FrameTracker
from vggt_slam_tpu.slam.loop_closure import ImageRetrieval
from vggt_slam_tpu.slam.map import GraphMap
from vggt_slam_tpu.slam.submap import Submap

# One-shot warning latch for runtimes without async device->host transfer.
_warned_async: dict = {}


class Solver:
    def __init__(self,
                 init_conf_threshold: float = 25.0,
                 use_point_map: bool = False,
                 use_sim3: bool = False,
                 viewer=None,
                 retrieval: ImageRetrieval | None = None,
                 vis_stride: int = 1,
                 vis_point_size: float = 0.001,
                 seed: int = 0,
                 keyframe_backend: str = "auto",
                 loop_inlier_thresh: float = 0.0):
        self.init_conf_threshold = init_conf_threshold
        self.use_point_map = use_point_map
        self.use_sim3 = use_sim3
        self.viewer = viewer
        # Geometric loop verification (no reference counterpart — the
        # reference accepts every retrieval hit under the 0.80 descriptor
        # bar, solver.py:355-357, viable only because its SALAD is
        # trained): reject a loop-closure factor when the loop RANSAC's
        # inlier fraction falls below `loop_inlier_thresh` TIMES the
        # running median of the SEQUENTIAL registrations' inlier
        # fractions. The sequential registration re-registers the same
        # overlap image across two independent forwards, so its fraction
        # IS the achievable maximum under the current model's depth
        # noise — normalizing by it makes the gate self-calibrating
        # (an absolute threshold would need re-tuning per checkpoint /
        # noise level; calibration data in evals/retrieval_quality.py
        # --geometric_gate: true revisits land at ratio 1.0-1.08, false
        # retrieval hits at 0.27-0.86 under 2% depth noise). The
        # weight-free tiny retrieval backend measures 0.31-0.83
        # precision on synthetic revisits (evals/results/
        # retrieval_quality.csv), and an accepted false loop becomes an
        # SL(4) between-factor at sigma=0.05 that drags the whole
        # graph. 0 disables (reference semantics).
        self.loop_inlier_thresh = loop_inlier_thresh
        self.rejected_loop_count = 0
        self._seq_reg_fracs: list[float] = []

        if keyframe_backend == "auto":
            # Host cv2 everywhere: the gate is 1000 independent 21x21 LK
            # solves - gather-bound, a shape TPUs are worst at. Measured
            # with true scalar-readback syncs (bench.py gate rows): cv2
            # 9-43 ms/frame on a 1-core host vs 1935 ms/frame for the
            # jitted tracker ON DEVICE-RESIDENT inputs (the kernel, not
            # the tunnel, is the cost - per-point dynamic gathers in
            # lk_track). An earlier "jax wins on TPU" note here was timed
            # through axon's early-returning block_until_ready and was
            # wrong; it silently made the device gate dominate eval wall
            # time (~2 s/frame). keyframe_backend="jax" remains an
            # explicit opt-in for gather-efficient backends.
            keyframe_backend = "cv2"
        self.flow_tracker = FrameTracker(backend=keyframe_backend)
        self.map = GraphMap()
        self.graph = PoseGraph("se3" if use_sim3 else "sl4")
        self.image_retrieval = retrieval if retrieval is not None else ImageRetrieval()
        self.current_working_submap: Submap | None = None
        self.first_edge = True
        self.prior_pcd: np.ndarray | None = None
        self.prior_conf: np.ndarray | None = None
        self.vis_stride = vis_stride
        self.vis_point_size = vis_point_size
        self._key = jax.random.PRNGKey(seed)
        self.timer = None  # optional utils.profiling.StageTimer

    def _stage(self, name: str):
        return (self.timer.stage(name) if self.timer is not None
                else contextlib.nullcontext())

    # ------------------------------------------------------------------ #
    # Perception phase
    # ------------------------------------------------------------------ #

    def run_predictions(self, image_names, model_fn, max_loops: int,
                        semantic_embeddings=None, names=None) -> dict:
        """Run retrieval + loop detection + VGGT forward for one submap.

        Args:
            image_names: list of image paths OR a preloaded (S,3,H,W) float
                array in [0,1].
            model_fn: callable images(S',3,H,W) -> prediction dict with keys
                pose_enc (S',9), depth (S',H,W,1), depth_conf (S',H,W),
                world_points (S',H,W,3), world_points_conf (S',H,W).
            max_loops: loop-closure budget for this submap.
        """
        pending = self.dispatch_predictions(image_names, model_fn, max_loops,
                                            semantic_embeddings, names)
        return self.collect_predictions(pending)

    def dispatch_predictions(self, image_names, model_fn, max_loops: int,
                             semantic_embeddings=None, names=None,
                             new_id=None, previous_in_map: bool = True) -> dict:
        """Phase 1 of run_predictions: retrieval + loop detection + forward
        DISPATCH. Returns a pending dict whose model outputs may still be
        device arrays; `collect_predictions` materializes them.

        The split exists for the pipelined SLAM loop: dispatch submap k+1's
        forward, then integrate submap k on host while the device works.
        In that mode submap k is not yet in the map, so pass its id + 1 as
        `new_id` and `previous_in_map=False` (the loop search then skips
        nothing extra - the reference's previous-submap exclusion is
        satisfied by k's absence)."""
        if isinstance(image_names, (list, tuple)):
            images = load_and_preprocess_images(list(image_names))
            names = list(image_names)
        else:
            images = np.asarray(image_names, dtype=np.float32)
            if names is None:
                names = [f"{i}.png" for i in range(images.shape[0])]

        if new_id is None:
            new_id = self.map.get_largest_key() + 1
        new_submap = Submap(new_id)
        new_submap.add_all_frames(images)
        new_submap.set_frame_ids(names)
        new_submap.set_all_retrieval_vectors(
            self.image_retrieval.get_all_submap_embeddings(new_submap))

        detected_loops = self.image_retrieval.find_loop_closures(
            self.map, new_submap, max_loop_closures=max_loops,
            skip_last=previous_in_map)
        retrieved_frames = self.map.get_frames_from_loops(detected_loops)

        new_submap.set_last_non_loop_frame_index(images.shape[0] - 1)
        if retrieved_frames:
            loop_batch = np.stack([np.asarray(f) for f in retrieved_frames])
            images = np.concatenate([images, loop_batch], axis=0)
            new_submap.add_all_frames(images)

        if semantic_embeddings is not None:
            sem = np.asarray(semantic_embeddings, dtype=np.float32)
            if sem.ndim != 4:
                raise ValueError(
                    f"semantic_embeddings must be (S,H,W,d), got {sem.shape}")
            target_hw = (images.shape[-2], images.shape[-1])
            if sem.shape[1:3] != target_hw:
                sem = np.asarray(jax.image.resize(
                    jnp.asarray(sem),
                    (sem.shape[0],) + target_hw + (sem.shape[-1],),
                    method="bilinear"))
            if images.shape[0] != sem.shape[0]:
                padded = np.zeros((images.shape[0],) + sem.shape[1:], np.float32)
                padded[: sem.shape[0]] = sem
                sem = padded
            new_submap.add_all_semantic_embeddings(sem)

        self.current_working_submap = new_submap

        # model_fn may return device arrays (make_bucketed_model_fn with
        # as_numpy=False): this call only dispatches the forward.
        outputs = model_fn(images)
        for v in outputs.values():
            # Enqueue device->host copies right behind the forward so the
            # ~0.5 GB of dense maps stream back WHILE the host integrates
            # the previous submap; collect_predictions' np.asarray then
            # finds the data already resident. No-op for numpy outputs or
            # runtimes without async transfer.
            fn = getattr(v, "copy_to_host_async", None)
            if fn is not None:
                try:
                    fn()
                except (NotImplementedError, jax.errors.JaxRuntimeError) as e:
                    # Runtime lacks async transfer: fine, collect_predictions
                    # will do a synchronous readback. Anything else (OOM,
                    # device failure) must surface HERE, not at collect time.
                    if not _warned_async.get("done"):
                        _warned_async["done"] = True
                        print(f"note: async device->host copy unavailable "
                              f"({type(e).__name__}); falling back to "
                              f"synchronous readback", file=sys.stderr)
        return {"outputs": outputs, "images": images,
                "detected_loops": detected_loops, "submap": new_submap}

    def collect_predictions(self, pending: dict) -> dict:
        """Phase 2: materialize the forward's outputs on host and decode
        camera parameters. This is where the device sync happens."""
        images = pending["images"]
        predictions = {}
        for k, v in pending["outputs"].items():
            if k in ("world_points_cf", "unproj_points_cf"):
                # channel-first at the jit boundary (fast transfer layout);
                # the moveaxis VIEW restores the (S,H,W,3) numpy contract.
                predictions[k.replace("_cf", "")] = np.moveaxis(
                    np.asarray(v), 0, -1)
            else:
                predictions[k] = np.asarray(v)
        if "extrinsic" not in predictions:
            extrinsic, intrinsic = geometry.pose_encoding_to_extri_intri(
                jnp.asarray(predictions["pose_enc"]), images.shape[-2:])
            predictions["extrinsic"] = np.asarray(extrinsic)
            predictions["intrinsic"] = np.asarray(intrinsic)
        predictions["images"] = images
        predictions["detected_loops"] = pending["detected_loops"]
        predictions["submap"] = pending["submap"]
        return predictions

    # ------------------------------------------------------------------ #
    # Registration phase
    # ------------------------------------------------------------------ #

    @staticmethod
    def _put_points(X):
        """Host (N,3) cloud -> device, routed channel-first.

        Uploading an (N,3) array directly tiles its size-3 minor dim to 128
        lanes; through the axon tunnel that transfer's per-shape setup never
        finishes (>10 min measured). A (3,N) upload is clean (unpadded) and
        the device-side transpose back is microseconds of HBM traffic.
        """
        if isinstance(X, jnp.ndarray):
            return X
        X = np.asarray(X, dtype=np.float32)
        return jnp.asarray(np.ascontiguousarray(X.T)).T

    def _ransac(self, X1, X2, weights=None, return_inlier_frac=False):
        self._key, sub = jax.random.split(self._key)
        H, count = ransac_projective(
            self._put_points(X1), self._put_points(X2),
            None if weights is None else jnp.asarray(
                np.asarray(weights, np.float32)),
            key=sub)
        if return_inlier_frac:
            n = (float(np.sum(np.asarray(weights, np.float32)))
                 if weights is not None else float(len(X1)))
            return (np.asarray(H, dtype=np.float64),
                    float(count) / max(n, 1.0))
        return np.asarray(H, dtype=np.float64)

    def add_points(self, pred_dict: dict) -> None:
        images = pred_dict["images"]
        extrinsics_cam = pred_dict["extrinsic"]
        intrinsics_cam = pred_dict["intrinsic"]
        detected_loops = pred_dict["detected_loops"]

        wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        with self._stage("ap_unpack"):
            if self.use_point_map:
                world_points = np.asarray(pred_dict["world_points"],
                                          np.float64)
                conf = np.asarray(pred_dict["world_points_conf"])
            elif "unproj_points" in pred_dict:
                # depth-unprojection already ran inside the model's compiled
                # program (make_bucketed_model_fn with_unprojection=True)
                world_points = pred_dict["unproj_points"]
                conf = np.asarray(pred_dict["depth_conf"])
            else:
                # Channel-first through the jit boundary (see _put_points);
                # moveaxis restores the (S,H,W,3) numpy view for free.
                depth = np.asarray(pred_dict["depth"])
                world_points = np.moveaxis(np.asarray(
                    geometry.unproject_depth_map_to_point_map_cf(
                        jnp.asarray(depth[..., 0] if depth.ndim == 4
                                    else depth, wide),
                        jnp.asarray(extrinsics_cam, wide),
                        jnp.asarray(intrinsics_cam, wide))), 0, -1)
                conf = np.asarray(pred_dict["depth_conf"])

        with self._stage("ap_colors"):
            colors = (np.transpose(images, (0, 2, 3, 1)) * 255).astype(
                np.uint8)
        with self._stage("ap_poses"):
            # Host numpy SE(3) inverse (R^T, -R^T t). The earlier
            # lie.se3_inverse device call dispatched eagerly through the
            # axon tunnel (~2.5 s/submap of round trips for 34 tiny 4x4
            # ops, evals/results/pipeline_overlap.txt r5 bisect) AND
            # forced a device sync mid-integration, which in pipelined
            # mode queued behind the in-flight forward and defeated the
            # dispatch-ahead overlap. (S, 3or4, 4) accepted.
            E = np.asarray(extrinsics_cam,
                           np.float64 if jax.config.jax_enable_x64
                           else np.float32)
            R = E[:, :3, :3]
            t = E[:, :3, 3]
            Rt = np.transpose(R, (0, 2, 1))
            cam_to_world = np.tile(np.eye(4, dtype=E.dtype),
                                   (E.shape[0], 1, 1))
            cam_to_world[:, :3, :3] = Rt
            cam_to_world[:, :3, 3] = -np.einsum("nij,nj->ni", Rt, t)

        sub = pred_dict.get("submap") or self.current_working_submap
        new_id = sub.get_id()

        if self.first_edge:
            self.first_edge = False
            self.prior_pcd = world_points[-1].reshape(-1, 3)
            self.prior_conf = conf[-1].reshape(-1)
            H_w_submap = np.eye(4)
            self.graph.add_homography(new_id, H_w_submap)
            self.graph.add_prior_factor(new_id, H_w_submap, self.graph.anchor_noise)
        else:
            prior_id = self.map.get_largest_key()
            prior_submap = self.map.get_submap(prior_id)
            with self._stage("ap_mask"):
                current_pts = world_points[0].reshape(-1, 3)

                # Reference solver.py:286 - note the literal bool-multiply:
                # prior_conf > thr where current conf > thr, else
                # prior_conf > 0.
                thr = prior_submap.get_conf_threshold()
                good_mask = self.prior_conf > thr * (
                    conf[0].reshape(-1) > thr).astype(conf.dtype)

            if self.use_sim3:
                idx = prior_submap.get_last_non_loop_frame_index()
                T_prior = np.eye(4)
                T_prior[:3, :3] = prior_submap.poses[idx][0:3, 0:3]
                T_prior[:3, 3] = prior_submap.poses[idx][0:3, 3]
                T_inv = np.linalg.inv(T_prior)
                prior_in_cam = (T_inv[:3, :3] @ self.prior_pcd[good_mask].T).T \
                    + T_inv[:3, 3]
                scale_factor = float(np.mean(
                    np.linalg.norm(prior_in_cam, axis=1) /
                    (np.linalg.norm(current_pts[good_mask], axis=1) + 1e-12)))
                H_relative = T_prior.copy()
                world_points = world_points * scale_factor
                cam_to_world[:, 0:3, 3] *= scale_factor
            else:
                with self._stage("ap_ransac"):
                    H_relative = self._ransac(
                        current_pts, self.prior_pcd,
                        weights=good_mask.astype(np.float32))

            H_w_submap = prior_submap.get_reference_homography() @ H_relative

            if self.loop_inlier_thresh > 0:
                # Gate calibration sample: UNWEIGHTED registration of the
                # overlap frame (the same statistic the loop gate below
                # computes — the factor RANSAC above is conf-weighted,
                # which would bias the reference upward). ~20 ms/submap,
                # only when the gate is enabled.
                with self._stage("ap_gate_ref"):
                    _, seq_frac = self._ransac(
                        current_pts, self.prior_pcd,
                        return_inlier_frac=True)
                self._seq_reg_fracs.append(seq_frac)

            non_lc = sub.get_last_non_loop_frame_index()
            with self._stage("ap_prior"):
                self.prior_pcd = world_points[non_lc].reshape(-1, 3)
                self.prior_conf = conf[non_lc].reshape(-1)

            self.graph.add_homography(new_id, H_w_submap)
            self.graph.add_between_factor(prior_id, new_id, H_relative,
                                          self.graph.relative_noise)

        with self._stage("ap_homog_poses"):
            sub.set_reference_homography(H_w_submap)
            sub.add_all_poses(cam_to_world)
        with self._stage("ap_submap_store"):
            sub.add_all_points(world_points, colors, conf,
                               self.init_conf_threshold, intrinsics_cam)
            sub.set_conf_masks(conf)

        for index, loop in enumerate(detected_loops):
            assert loop.query_submap_id == sub.get_id()
            loop_index = sub.get_last_non_loop_frame_index() + index + 1
            inlier_frac = None
            if self.use_sim3:
                pose_det = self.map.get_submap(loop.detected_submap_id) \
                    .get_pose_subframe(loop.detected_submap_frame)
                pose_query = sub.get_pose_subframe(loop_index)
                # GTSAM Pose3.between(a, b) = a^-1 b (reference solver.py:353)
                H_rel_lc = np.linalg.inv(pose_det) @ pose_query
                if self.loop_inlier_thresh > 0:
                    # Sim3 mode takes the factor from the poses, but the
                    # geometric gate still needs evidence the two frames
                    # see the same surface: run the same registration
                    # RANSAC purely as a verification score.
                    pts_det = self.map.get_submap(loop.detected_submap_id) \
                        .get_frame_pointcloud(loop.detected_submap_frame) \
                        .reshape(-1, 3)
                    pts_query = sub.get_frame_pointcloud(loop_index) \
                        .reshape(-1, 3)
                    with self._stage("ap_loop_ransac"):
                        _, inlier_frac = self._ransac(
                            pts_query, pts_det, return_inlier_frac=True)
            else:
                pts_det = self.map.get_submap(loop.detected_submap_id) \
                    .get_frame_pointcloud(loop.detected_submap_frame).reshape(-1, 3)
                pts_query = sub.get_frame_pointcloud(loop_index).reshape(-1, 3)
                with self._stage("ap_loop_ransac"):
                    H_rel_lc, inlier_frac = self._ransac(
                        pts_query, pts_det, return_inlier_frac=True)
            gate_ref = (float(np.median(self._seq_reg_fracs))
                        if self._seq_reg_fracs else None)
            if (self.loop_inlier_thresh > 0 and inlier_frac is not None
                    and gate_ref is not None and gate_ref > 0
                    and inlier_frac < self.loop_inlier_thresh * gate_ref):
                # Reject: the retrieval hit has no consistent projective
                # registration between the two views. The loop FRAME has
                # already ridden through the forward (it is part of this
                # submap's batch, matching the reference flow) — only the
                # graph factor is withheld, so a rejected loop costs
                # nothing downstream.
                self.rejected_loop_count += 1
                print(f"loop rejected by geometric gate: submap "
                      f"{loop.detected_submap_id} frame "
                      f"{loop.detected_submap_frame} -> submap "
                      f"{loop.query_submap_id} (inlier frac "
                      f"{inlier_frac:.3f} < {self.loop_inlier_thresh} x "
                      f"sequential median {gate_ref:.3f})")
                continue
            self.graph.add_between_factor(loop.detected_submap_id,
                                          loop.query_submap_id, H_rel_lc,
                                          self.graph.relative_noise)
            self.graph.increment_loop_closure()

        self.map.add_submap(sub)

    # ------------------------------------------------------------------ #
    # Visualization pass-throughs (no-ops without a viewer)
    # ------------------------------------------------------------------ #

    def set_submap_point_cloud(self, submap):
        if self.viewer is None:
            return
        self.viewer.add_point_cloud(
            submap.get_points_in_world_frame(stride=self.vis_stride),
            submap.get_points_colors(stride=self.vis_stride),
            name=str(submap.get_id()), point_size=self.vis_point_size)

    def set_submap_poses(self, submap):
        if self.viewer is None:
            return
        self.viewer.add_frames(submap.get_all_poses_world(),
                               submap.get_all_frames(), submap.get_id())

    def update_all_submap_vis(self):
        for submap in self.map.get_submaps():
            self.set_submap_point_cloud(submap)
            self.set_submap_poses(submap)

    def update_latest_submap_vis(self):
        submap = self.map.get_latest_submap()
        self.set_submap_point_cloud(submap)
        self.set_submap_poses(submap)

    def export_3d_scene(self, output_path: str = "output.glb"):
        if self.viewer is None:
            raise RuntimeError("no viewer attached")
        return self.viewer.export(output_path)
