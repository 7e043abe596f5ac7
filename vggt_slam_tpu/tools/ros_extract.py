"""ROS bag -> downsampled JPEG frame extraction.

Counterpart of reference scripts/ros_to_jpg.py. `rosbag`/`cv_bridge` are
optional; when absent the tool also accepts `rosbags` (pure-python) if
available, else explains what is missing.

CLI: python -m vggt_slam_tpu.tools.ros_extract --bag in.bag --topic /cam0/image_raw \
        --out_dir frames --stride 3
"""
from __future__ import annotations

import argparse
import os


def extract_with_rosbag(bag_path, topic, out_dir, stride):
    import rosbag  # type: ignore
    from cv_bridge import CvBridge  # type: ignore
    import cv2

    bridge = CvBridge()
    os.makedirs(out_dir, exist_ok=True)
    n = saved = 0
    with rosbag.Bag(bag_path) as bag:
        for _, msg, t in bag.read_messages(topics=[topic]):
            if n % stride == 0:
                img = bridge.imgmsg_to_cv2(msg, desired_encoding="bgr8")
                cv2.imwrite(os.path.join(out_dir, f"{t.to_nsec()}.jpg"), img)
                saved += 1
            n += 1
    return saved


def extract_with_rosbags(bag_path, topic, out_dir, stride):
    from rosbags.highlevel import AnyReader  # type: ignore
    from pathlib import Path
    import numpy as np
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    n = saved = 0
    with AnyReader([Path(bag_path)]) as reader:
        conns = [c for c in reader.connections if c.topic == topic]
        for conn, timestamp, raw in reader.messages(connections=conns):
            if n % stride == 0:
                msg = reader.deserialize(raw, conn.msgtype)
                img = np.frombuffer(msg.data, dtype=np.uint8).reshape(
                    msg.height, msg.width, -1)
                cv2.imwrite(os.path.join(out_dir, f"{timestamp}.jpg"), img)
                saved += 1
            n += 1
    return saved


def main():
    p = argparse.ArgumentParser(description="Extract JPEG frames from a rosbag")
    p.add_argument("--bag", required=True)
    p.add_argument("--topic", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--stride", type=int, default=1)
    args = p.parse_args()
    try:
        n = extract_with_rosbag(args.bag, args.topic, args.out_dir, args.stride)
    except ImportError:
        try:
            n = extract_with_rosbags(args.bag, args.topic, args.out_dir,
                                     args.stride)
        except ImportError:
            raise SystemExit(
                "Neither `rosbag`+`cv_bridge` nor `rosbags` is installed; "
                "install one of them to extract bag frames.")
    print(f"saved {n} frames -> {args.out_dir}")


if __name__ == "__main__":
    main()
