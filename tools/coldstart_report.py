"""Cold-start compile breakdown (round-2 demand #4 / r4 runbook step 7).

Runs one bench warmup with FRESH caches (persistent XLA cache + AOT
executable cache redirected to a temp dir), captures jax_log_compiles
output, and writes a per-executable compile-time table to stdout (save it
to docs/coldstart_r4.md). Run ON the TPU terminal; takes one full cold
compile sweep (~10-40 min through the remote helper).

    python tools/coldstart_report.py [--quick]
"""

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

# jax_log_compiles lines look like:
#   Finished tracing + transforming <name> in <X> sec
#   Compiling <name> with global shapes ... -> here we want the paired
#   Finished XLA compilation of <name> in <X> sec
_TRACE_RE = re.compile(
    r"Finished tracing \+ transforming (.+?) in ([0-9.]+) sec")
_COMPILE_RE = re.compile(
    r"Finished XLA compilation of (.+?) in ([0-9.]+) sec")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--keep-cache", action="store_true",
                        help="reuse the default caches (warm-start report)")
    args = parser.parse_args()

    env = dict(os.environ)
    if not args.keep_cache:
        fresh = tempfile.mkdtemp(prefix="bdm_coldstart_")
        env["BDM_COMPILE_CACHE_DIR"] = os.path.join(fresh, "xla")
        env["BDM_AOT_CACHE_DIR"] = os.path.join(fresh, "aot")
        print(f"# fresh caches in {fresh}")
    cmd = [sys.executable, "bench.py", "--worker", "--repeats", "1"]
    if args.quick:
        cmd += ["--quick", "--precision", "no"]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=5400,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    wall = time.time() - t0
    traces, compiles = {}, {}
    for line in proc.stderr.splitlines():
        m = _TRACE_RE.search(line)
        if m:
            traces[m.group(1)] = traces.get(m.group(1), 0.0) + float(
                m.group(2))
        m = _COMPILE_RE.search(line)
        if m:
            compiles[m.group(1)] = compiles.get(m.group(1), 0.0) + float(
                m.group(2))
    warm = [ln for ln in proc.stderr.splitlines() if "warmup done" in ln]

    print(f"# cold-start report  (worker rc={proc.returncode}, "
          f"wall {wall:.0f}s, {warm[0].strip() if warm else 'no warmup line'})")
    print(f"# executables compiled: {len(compiles)}, "
          f"total compile {sum(compiles.values()):.1f}s, "
          f"total trace {sum(traces.values()):.1f}s")
    print("| executable | compile s | trace s |")
    print("|---|---|---|")
    for name, sec in sorted(compiles.items(), key=lambda kv: -kv[1])[:25]:
        print(f"| {name[:70]} | {sec:.1f} | {traces.get(name, 0.0):.1f} |")
    rest = sum(sec for name, sec in sorted(
        compiles.items(), key=lambda kv: -kv[1])[25:])
    if rest:
        print(f"| (all others) | {rest:.1f} | |")
    if proc.returncode != 0:
        print("# WORKER FAILED — tail of stderr:")
        print("\n".join(proc.stderr.splitlines()[-15:]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
