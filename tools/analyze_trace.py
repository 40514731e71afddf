"""Offline xprof trace breakdown: device-time by HLO category and top ops.

Reads the .xplane.pb files a `jax.profiler.trace` capture writes (no
tensorboard server needed — the plugin's converter is broken against this
TF build, so this parses the XSpace proto directly) and prints:

  * total device busy time per TPU core plane,
  * time by HLO category (stat `hlo_category` when present, else a name
    heuristic), as absolute seconds and % of busy time,
  * the top-N individual ops by summed duration.

Usage: python tools/analyze_trace.py <trace_dir_or_xplane.pb> [top_n]
(`trace_dir` may be the --out dir of tools/capture_trace.py; the newest
 *.xplane.pb under it is used.)
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return max(hits, key=os.path.getmtime)


_CATEGORY_RULES = [
    (re.compile(r"all-reduce|all-gather|reduce-scatter|collective"), "collective"),
    (re.compile(r"^(fusion|loop_fusion|input_fusion)|fusion"), "fusion"),
    (re.compile(r"convolution|conv\b"), "convolution"),
    (re.compile(r"\bdot\b|dot_general|einsum|matmul"), "matmul"),
    (re.compile(r"dynamic-slice|dynamic-update-slice|gather|scatter"), "gather/scatter"),
    (re.compile(r"\bcopy\b|copy-start|copy-done|transpose|bitcast"), "copy/layout"),
    (re.compile(r"reduce|cumsum"), "reduce"),
    (re.compile(r"sort|top-k|topk"), "sort/topk"),
    (re.compile(r"custom-call"), "custom-call"),
    (re.compile(r"infeed|outfeed|host"), "host-transfer"),
]


def categorize(name: str, stat_category: str | None) -> str:
    if stat_category:
        return stat_category
    low = name.lower()
    for rx, cat in _CATEGORY_RULES:
        if rx.search(low):
            return cat
    return "other"


def main():
    path = find_xplane(sys.argv[1] if len(sys.argv) > 1 else "/tmp/diffreg_trace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    report = {"xplane": path, "planes": []}
    for plane in space.planes:
        # device planes only (TPU core / accelerator); skip host threads
        if not re.search(r"TPU|/device|gpu", plane.name, re.I):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        st_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        # per-event-metadata category stat, if the runtime recorded one
        meta_cat = {}
        for m in plane.event_metadata.values():
            for st in m.stats:
                if st_meta.get(st.metadata_id, "") in ("hlo_category", "category"):
                    meta_cat[m.id] = st.str_value or None

        by_op = defaultdict(float)
        by_cat = defaultdict(float)
        # Use the synchronous "XLA Ops" line: "Async XLA Ops" spans cover
        # wait time overlapped with compute (prefetches, DMAs) and "XLA
        # Modules" is one span per program — neither is an op breakdown.
        best_line, best_busy = None, -1.0
        line_tot = {}
        for line in plane.lines:
            tot = sum(ev.duration_ps for ev in line.events) / 1e12
            line_tot[line.name or str(line.id)] = tot
            if line.name == "XLA Ops":
                best_line, best_busy = line, tot
        if best_line is None:
            for line in plane.lines:
                tot = line_tot[line.name or str(line.id)]
                if tot > best_busy:
                    best_line, best_busy = line, tot
        if best_line is None:
            continue
        # EXCLUSIVE durations: control-flow ops (the DDIM `while`) appear as
        # parent spans that contain their body ops on the same line —
        # subtract nested child time so categories sum to the real busy time
        evs = sorted(best_line.events, key=lambda e: (e.offset_ps, -e.duration_ps))
        child_time = defaultdict(float)           # event index -> nested ps
        in_scan = [False] * len(evs)              # under a `while` span?
        stack = []                                 # indices of open parents
        for idx, ev in enumerate(evs):
            while stack and (evs[stack[-1]].offset_ps +
                             evs[stack[-1]].duration_ps) <= ev.offset_ps:
                stack.pop()
            if stack:
                child_time[stack[-1]] += ev.duration_ps
                parent = evs[stack[-1]]
                in_scan[idx] = (in_scan[stack[-1]] or ev_meta.get(
                    parent.metadata_id, "").startswith("%while"))
            stack.append(idx)
        busy_excl = 0.0
        scan_s = 0.0
        by_op_scan = defaultdict(float)
        for idx, ev in enumerate(evs):
            name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
            dur = max(ev.duration_ps - child_time.get(idx, 0.0), 0.0) / 1e12
            busy_excl += dur
            if in_scan[idx] or name.startswith("%while"):
                scan_s += dur
                by_op_scan[name] += dur
            by_op[name] += dur
            cat = None
            for st in ev.stats:
                if st_meta.get(st.metadata_id, "") in ("hlo_category", "category"):
                    cat = st.str_value or None
            by_cat[categorize(name, cat or meta_cat.get(ev.metadata_id))] += dur
        best_busy = busy_excl

        ops = sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]
        cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
        report["planes"].append({
            "plane": plane.name,
            "line_used": best_line.name,
            "busy_s": round(best_busy, 4),
            "ddim_scan_s": round(scan_s, 4),
            "outside_scan_s": round(best_busy - scan_s, 4),
            "lines_s": {k: round(v, 4) for k, v in line_tot.items()},
            "by_category": [
                {"category": c, "s": round(t, 4),
                 "pct": round(100 * t / best_busy, 1)} for c, t in cats],
            "top_ops": [
                {"op": o, "s": round(t, 5),
                 "pct": round(100 * t / best_busy, 1)} for o, t in ops],
            "top_ops_in_scan": [
                {"op": o, "s": round(t, 5),
                 "pct_of_scan": round(100 * t / max(scan_s, 1e-12), 1)}
                for o, t in sorted(by_op_scan.items(),
                                   key=lambda kv: -kv[1])[:top_n]],
        })

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
