"""Minimal XSpace/XPlane trace reader (no tensorflow/tsl proto deps).

jax.profiler.trace writes <dir>/plugins/profile/<run>/<host>.xplane.pb, an
XSpace protobuf. The full toolchain to read it (tensorboard_plugin_profile)
is version-broken in this environment, so this decodes the wire format
directly with a generic varint walker - enough to aggregate per-op device
time, which is what kernel optimization here needs.

Wire assumptions (tsl/profiler/protobuf/xplane.proto, stable for years):
  XSpace.planes = 1 (msg)
  XPlane.name = 2 (str), .lines = 3 (msg), .event_metadata = 4 (map)
  XEventMetadata map entry: key=1, value=2{ id=1, name=2, display_name=4 }
  XLine.name = 2 (str), .events = 4 (msg)
  XEvent.metadata_id = 1, .duration_ps = 3

Usage:
    from vggt_slam_tpu.utils.xplane import op_times
    for name, tot_ms, n in op_times("/tmp/trace")[:30]:
        print(f"{tot_ms:8.3f} ms x{n:4d}  {name}")
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = int.from_bytes(buf[i:i + 8], "little"), i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = int.from_bytes(buf[i:i + 4], "little"), i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def parse_plane(buf: bytes) -> dict:
    """One XPlane -> {name, metadata: {id: name}, events: [(meta_id, dur_ps)]}."""
    name = ""
    meta = {}
    events = []
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4 and wt == 2:  # event_metadata map entry
            mid, mname, mdisp = None, "", ""
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
                        elif f3 == 4 and w3 == 2:
                            mdisp = v3.decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mdisp or mname
        elif fn == 3 and wt == 2:  # XLine
            lname = ""
            levents = []
            for f2, w2, v2 in _fields(v):
                if f2 == 2 and w2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 4 and w2 == 2:  # XEvent
                    mid, dur = None, 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    if mid is not None:
                        levents.append((mid, dur))
            events.extend((lname, m, d) for m, d in levents)
    return {"name": name, "metadata": meta, "events": events}


def parse_xspace(path: str) -> list[dict]:
    with open(path, "rb") as f:
        buf = f.read()
    return [parse_plane(v) for fn, wt, v in _fields(buf)
            if fn == 1 and wt == 2]


def find_xplane(trace_dir: str) -> str:
    pats = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not pats:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return max(pats, key=os.path.getmtime)


def op_times(trace_dir: str, plane_filter: str = "TPU",
             line_filter: str = "") -> list:
    """Aggregate device op times: [(op_name, total_ms, count)], descending.

    Sums event durations on every plane whose name contains `plane_filter`
    (default: the TPU device plane; pass "" for all planes) and every line
    whose name contains `line_filter`. Durations on different lines of one
    plane OVERLAP in wall time (compute steps vs async DMA streams) - for
    a serial compute budget, restrict to the XLA op line (e.g.
    line_filter="XLA Ops" on TPU traces).
    """
    agg = defaultdict(lambda: [0.0, 0])
    for plane in parse_xspace(find_xplane(trace_dir)):
        if plane_filter and plane_filter not in plane["name"]:
            continue
        md = plane["metadata"]
        for lname, mid, dur in plane["events"]:
            if line_filter and line_filter not in lname:
                continue
            a = agg[md.get(mid, f"#{mid}")]
            a[0] += dur * 1e-9  # ps -> ms
            a[1] += 1
    rows = [(k, v[0], v[1]) for k, v in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def line_names(trace_dir: str, plane_filter: str = "TPU") -> list:
    """[(plane_name, line_name, total_ms, n_events)] for trace exploration."""
    out = defaultdict(lambda: [0.0, 0])
    for plane in parse_xspace(find_xplane(trace_dir)):
        if plane_filter and plane_filter not in plane["name"]:
            continue
        for lname, mid, dur in plane["events"]:
            a = out[(plane["name"], lname)]
            a[0] += dur * 1e-9
            a[1] += 1
    return [(p, ln, v[0], v[1]) for (p, ln), v in sorted(out.items())]


if __name__ == "__main__":
    import sys
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    pf = sys.argv[2] if len(sys.argv) > 2 else "TPU"
    lf = sys.argv[3] if len(sys.argv) > 3 else ""
    if lf == "--lines":
        for p, ln, ms, n in line_names(d, pf):
            print(f"{ms:10.3f} ms x{n:6d}  [{p}] {ln}")
    else:
        for name, ms, n in op_times(d, pf, lf)[:40]:
            print(f"{ms:9.3f} ms x{n:5d}  {name[:110]}")
