"""Aggregate a jax.profiler trace.json.gz by device-plane op.

    python -m diffuvolume_tpu.tools.parse_trace /tmp/igev_trace [--top 40]

Groups XLA op events on the /device:TPU plane by base name (fusion.123 ->
fusion) and by full name, printing total/percent/count, so the in-scan cost
split (convolution vs fusion vs copy) is visible per HLO op.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def load_latest(outdir: str):
    paths = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {outdir}")
    path = paths[-1]
    print(f"# {path}")
    return json.load(gzip.open(path))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--grep", default=None, help="only ops whose name contains this")
    p.add_argument("--by_source", action="store_true",
                   help="aggregate by the op's Python source line + HLO category "
                        "(XLA records op provenance in the event args)")
    p.add_argument("--count", type=int, default=None,
                   help="only ops with exactly this event count (e.g. the scan "
                        "trip count, to isolate per-iteration ops)")
    p.add_argument("--by_shape", action="store_true",
                   help="aggregate by source line + HLO OUTPUT SHAPE (parsed "
                        "from args.long_name — splits e.g. the per-conv-shape "
                        "cost inside one nn.Conv call site)")
    p.add_argument("--cat", default=None,
                   help="only ops whose hlo_category contains this")
    args = p.parse_args(argv)

    d = load_latest(args.outdir)
    evs = d.get("traceEvents", [])
    pid_names = {}
    for ev in evs:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, n in pid_names.items() if "TPU" in n or "device" in n.lower()}

    total = 0.0
    by_full = defaultdict(lambda: [0.0, 0])
    for ev in evs:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev["name"]
        dur = ev.get("dur", 0)  # microseconds
        a = ev.get("args", {})
        if args.cat and args.cat not in str(a.get("hlo_category", "")):
            continue
        total += dur
        if args.by_source or args.by_shape:
            src = a.get("source", "?")
            # Strip site-packages prefixes; keep repo-relative paths readable.
            for cut in ("/root/repo/", "site-packages/"):
                if cut in src:
                    src = src.split(cut, 1)[1]
            cat = a.get("hlo_category", "?")
            name = f"{src} [{cat}]"
            if args.by_shape:
                import re

                m = re.match(r"%\S+ = (\w+\[[\d,]*\])", a.get("long_name", ""))
                name = f"{src} [{cat}] out={m.group(1) if m else '?'}"
        by_full[name][0] += dur
        by_full[name][1] += 1

    print(f"# device total: {total/1000:.3f} ms over {sum(c for _, c in by_full.values())} events")
    rows = sorted(by_full.items(), key=lambda kv: -kv[1][0])
    print(f"{'us_total':>10} {'%':>6} {'count':>6} {'us/ea':>9}  name")
    shown = 0
    for name, (us, cnt) in rows:
        if args.grep and args.grep not in name:
            continue
        if args.count is not None and cnt != args.count:
            continue
        print(f"{us:10.0f} {100*us/max(total,1e-9):6.2f} {cnt:6d} {us/cnt:9.1f}  {name}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
