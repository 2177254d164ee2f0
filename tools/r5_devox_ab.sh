#!/bin/bash
# Round-5 devox A/B: profile the production window scan with the sorted
# matmul-form devoxelize (BDM_DEVOX=mm) vs the window-gather default
# (the `base` variant of tools/experiment_r4.sh). Serial — one jax
# process on the chip at a time.
set -u
cd /root/repo
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=upb

run_variant () {
  local name="$1"; shift
  local dir="/tmp/bdm_prof_${name}"
  rm -rf "$dir"
  echo "=== variant: $name ($*) $(date) ==="
  env "$@" BDM_PROF_DIR="$dir" timeout 2400 python - <<PY
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bdm_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache(min_compile_secs=0.0)
from bdm_tpu.samplers import PC2Model, ProjectionConfig
from __graft_entry__ import _synthetic_batch
pc2 = PC2Model(ProjectionConfig(mixed_precision="bf16"))
params = pc2.init_params(jax.random.PRNGKey(0), num_points=1024)
rng = np.random.default_rng(0)
batch = _synthetic_batch(8, 4096, pc2.cfg.image_size, rng)
cond = pc2.conditioning_map(params, batch["image"])
cond = pc2.maybe_precontract(params, cond)
x = jnp.asarray(rng.standard_normal((8, 4096, 3)).astype(np.float32))
sched = pc2.schedulers["ddpm"]
ts = list(range(500, 484, -1))
k = jax.random.PRNGKey(1)
def run(x):
    return pc2._window_scan(params, x, batch["camera"], cond, ts, sched, k)
t0 = time.time()
out = run(x); out.block_until_ready()
print(f"compiled in {time.time()-t0:.0f}s", flush=True)
assert bool(np.isfinite(np.asarray(out)).all())
jax.profiler.start_trace(os.environ["BDM_PROF_DIR"])
for _ in range(3):
    x2 = run(x); x2.block_until_ready()
jax.profiler.stop_trace()
print("profiled", flush=True)
PY
  timeout 600 python tools/parse_xplane.py "$dir" --iters 48 --agg 2>/dev/null | head -8
}

run_variant devox_mm BDM_DEVOX=mm
echo "=== r5 devox A/B done $(date) ==="
