"""Parse a jax.profiler .xplane.pb trace and print per-op self times.

The tensorboard profile plugin's converter is incompatible with this
image's TF/protobuf, so we carry a minimal xplane.proto and compile it
with protoc on first use.

    python tools/parse_xplane.py /tmp/bdm_prof [--iters 3] [--top 25]
"""

import argparse
import collections
import glob
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_proto():
    out = os.path.join(HERE, "xplane")
    if not os.path.exists(os.path.join(out, "xplane_pb2.py")):
        subprocess.run(["protoc", f"--python_out={out}", "xplane.proto"],
                       cwd=out, check=True)
    sys.path.insert(0, out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--iters", type=int, default=1,
                        help="divide totals by this many profiled steps")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--agg", action="store_true",
                        help="also aggregate by op family (fusion, "
                             "custom-call target, copy, ...) — copy-start/"
                             "slice-start spans overlap compute and are "
                             "reported separately, not added to the total")
    parser.add_argument("--modules", action="store_true",
                        help="print XLA Modules executions in trace order "
                             "(duration / iters) — maps A/B chains to "
                             "their launch order")
    args = parser.parse_args()

    # upb parses a 300 MB trace in ~2 s; the pure-python fallback takes
    # many minutes on large traces
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "upb")
    ensure_proto()
    import xplane_pb2

    files = sorted(glob.glob(os.path.join(args.trace_dir, "**",
                                          "*.xplane.pb"), recursive=True))
    if not files:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        tot = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                tot[plane.event_metadata[ev.metadata_id].name] += \
                    ev.duration_ps
        if args.modules:
            mods = []
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    mods.append((ev.offset_ps, ev.duration_ps,
                                 plane.event_metadata[ev.metadata_id].name))
            mods.sort()
            print(f"== {plane.name} modules in trace order")
            for off, dur, name in mods:
                print(f"{dur / args.iters / 1e6:10.1f} us/iter  {name[:70]}")
        print(f"== {plane.name} (top {args.top} by total time)")
        for name, ps in tot.most_common(args.top):
            print(f"{ps / args.iters / 1e6:10.1f} us/iter  {name[:95]}")
        if args.agg:
            fam = collections.Counter()
            for name, ps in tot.items():
                if name.startswith("jit_"):
                    continue
                if "copy-start" in name or "slice-start" in name \
                        or "copy-done" in name or "slice-done" in name:
                    key = "[async copy/slice spans (overlap!)]"
                elif "custom-call" in name:
                    # pull the pallas kernel name if present
                    key = "custom:" + name.split(" = ")[0].lstrip("%")
                    key = "custom:" + key.split(".")[0].split(":")[-1]
                elif " = " in name:
                    op = name.split(" = ")[1].split("(")[0].strip()
                    op = op.split(" ")[-1]
                    key = op.split(".")[0]
                else:
                    key = name.split(".")[0].split("(")[0]
                fam[key] += ps
            print(f"-- aggregated by family (us/iter)")
            for name, ps in fam.most_common(30):
                print(f"{ps / args.iters / 1e6:10.1f}  {name[:80]}")


if __name__ == "__main__":
    main()
