"""Minimal protobuf wire-format reader for JAX/TPU profiler xplane.pb traces.

The baked-in tensorboard_plugin_profile cannot parse xplanes here (its
generated protos predate protobuf 5 and its native helper symbol is
missing), so this module decodes the XSpace message directly from the wire
format. Schema (field numbers) follows tsl/profiler/protobuf/xplane.proto:

  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64, XEventMetadata> event_metadata=4; }
  XLine    { int64 id=1; string name=2; repeated XEvent events=4; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3; }
  XEventMetadata { int64 id=1; string name=2; string display_name=4; }

Only the fields needed for per-op self-time aggregation are decoded.
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Iterator, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    res = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        res |= (b & 0x7F) << shift
        if not b & 0x80:
            return res, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message body."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:          # varint
            val, i = _varint(buf, i)
        elif wtype == 2:        # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wtype == 5:        # 32-bit
            val = buf[i:i + 4]
            i += 4
        elif wtype == 1:        # 64-bit
            val = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def parse_plane(buf: bytes):
    """XPlane body -> (name, {meta_id: op_name}, [(line_name, events)])
    where events = [(metadata_id, duration_ps)]."""
    name = ""
    meta = {}
    lines = []
    for fnum, _, val in _fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4:          # map entry: {1: key, 2: XEventMetadata}
            mid, mname = None, ""
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
        elif fnum == 3:          # XLine
            lname = ""
            events = []
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 4:    # XEvent
                    mid = dur = 0
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    events.append((mid, dur))
            lines.append((lname, events))
    return name, meta, lines


def iter_planes(path: str):
    """Yield (plane_name, meta, lines) for every plane in an xplane.pb."""
    buf = open(path, "rb").read()
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            yield parse_plane(val)


def op_self_times(logdir: str, device_substr: str = "TPU",
                  line_substr: str = "XLA Ops"):
    """Aggregate per-op self time (ms) over all device-plane op lines.

    Returns (total_ms, Counter[name] -> ms, Counter[name] -> count).
    """
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    agg = collections.Counter()
    cnt = collections.Counter()
    for pname, meta, lines in iter_planes(paths[-1]):
        if device_substr not in pname:
            continue
        for lname, events in lines:
            # exact match: the substring "XLA Ops" would also catch the
            # "Async XLA Ops" line, whose events (async copy-start/done
            # spans) overlap the sync timeline and double-count ~4x the
            # real step time in copy ops.
            if lname != line_substr:
                continue
            for mid, dur in events:
                nm = meta.get(mid, f"meta_{mid}")
                agg[nm] += dur / 1e9
                cnt[nm] += 1
    return sum(agg.values()), agg, cnt


if __name__ == "__main__":
    import sys

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_b8"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    total, agg, cnt = op_self_times(logdir)
    print(f"device op self-time total: {total:.1f} ms")
    for nm, ms in agg.most_common(top):
        print(f"  {ms:8.2f} ms  x{cnt[nm]:4d}  {nm[:100]}")
