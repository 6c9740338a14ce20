#!/usr/bin/env python
"""Aggregate a captured xprof trace into a per-op device-time table.

Companion to tools/profile_visit.py: that script writes an
``*.xplane.pb`` under ``<logdir>/plugins/profile/<run>/``; this one
parses it (tsl xplane protobuf — no TensorBoard UI needed on this
headless box) and prints the device ops ranked by total time, which is
the ground truth behind PERF.md's stage shares.

Usage:
    python tools/profile_visit.py --logdir /tmp/wayne_trace
    python tools/parse_trace.py /tmp/wayne_trace [--top 30]
"""

import argparse
import collections
import glob
import gzip
import os
import sys


def load_xplanes(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir!r} — run "
                         "tools/profile_visit.py first")
    path = paths[-1]
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    return space, path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--line", default=None,
                        help="restrict to one plane line name (e.g. "
                             "'XLA Ops'); default: every device line")
    args = parser.parse_args()

    space, path = load_xplanes(args.logdir)
    print(f"trace: {path}", file=sys.stderr)
    for plane in space.planes:
        if not ("TPU" in plane.name or "/device:" in plane.name
                or "GPU" in plane.name):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals: dict[str, float] = collections.defaultdict(float)
        counts: dict[str, int] = collections.defaultdict(int)
        line_names = []
        for line in plane.lines:
            line_names.append(line.name)
            if args.line and line.name != args.line:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9      # -> ms
                counts[name] += 1
        if not totals:
            continue
        total_ms = sum(totals.values())
        print(f"\n== plane: {plane.name} "
              f"(lines: {', '.join(sorted(set(line_names)))}) ==")
        print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1]
                               )[: args.top]:
            print(f"{ms:10.3f} {100 * ms / total_ms:6.2f} "
                  f"{counts[name]:7d}  {name[:110]}")
        print(f"{total_ms:10.3f} {'100.0':>6}          TOTAL (line-summed; "
              "nested lines may double-count)")


if __name__ == "__main__":
    main()
