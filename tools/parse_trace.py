"""Aggregate an xprof Chrome-trace capture into a per-op cost table.

The tensorboard_plugin_profile converter is broken against the installed
TF/protobuf (CLAUDE.md), so this parses the ``*.trace.json.gz`` the JAX
profiler writes directly: completes events on TensorCore lines are grouped
by (fusion/op name), summed, and printed as a sorted table — the raw
material for the KERNELS.md step-budget accountings.

Usage:
    python tools/parse_trace.py LOGDIR [--steps N] [--top K] [--pid-filter S]

``--steps N`` additionally prints per-step costs (total / N).
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load_trace(logdir: str) -> dict:
    paths = sorted(
        glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main() -> None:
    logdir = sys.argv[1]
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else None
    top = int(sys.argv[sys.argv.index("--top") + 1]) \
        if "--top" in sys.argv else 40
    pid_filter = sys.argv[sys.argv.index("--pid-filter") + 1] \
        if "--pid-filter" in sys.argv else None

    trace = load_trace(logdir)
    events = trace["traceEvents"]
    # pid -> process name (XLA modules run on "/device:TPU:0 TensorCore"
    # style lines; host threads carry python names).
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")

    by_name: dict[str, list[float]] = defaultdict(list)
    device_total = 0.0
    t_lo, t_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pnames.get(e.get("pid"), "")
        is_device = ("TensorCore" in pname or "/device" in pname
                     or "TPU" in pname)
        if pid_filter:
            if pid_filter not in pname:
                continue
        elif not is_device:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        # Strip fusion instance suffixes so repeats aggregate.
        name = re.sub(r"\.\d+$", "", name)
        by_name[name].append(dur)
        device_total += dur
        ts = float(e.get("ts", 0.0))
        t_lo, t_hi = min(t_lo, ts), max(t_hi, ts + dur)

    rows = sorted(by_name.items(), key=lambda kv: -sum(kv[1]))
    wall = (t_hi - t_lo) if t_hi > t_lo else 0.0
    print(f"device-line busy total: {device_total/1e3:.2f} ms over "
          f"{wall/1e3:.2f} ms span "
          f"({100*device_total/max(wall,1e-9):.0f}% busy)")
    if steps:
        print(f"per-step ({steps} steps): busy {device_total/steps:.1f} us, "
              f"span {wall/steps:.1f} us")
    hdr = f"{'total ms':>9} {'calls':>6} {'us/call':>8}"
    hdr += f" {'us/step':>8}" if steps else ""
    print(hdr + "  name")
    for name, durs in rows[:top]:
        tot = sum(durs)
        line = f"{tot/1e3:9.2f} {len(durs):6d} {tot/len(durs):8.1f}"
        if steps:
            line += f" {tot/steps:8.1f}"
        print(line + f"  {name[:110]}")


if __name__ == "__main__":
    main()
