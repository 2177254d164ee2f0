#!/bin/bash
# Round-4 A/B queue: profile the production 16-step window scan under
# each pending variant and parse per-step totals. Run ON the TPU terminal
# (serial queue — nothing else on the chip). Each changed graph compiles
# ~10-15 min cold through the remote helper; identical graphs reload from
# /tmp/bdm_tpu_xla_cache in ~20 s.
#
#   bash tools/experiment_r4.sh            # all variants
#   bash tools/experiment_r4.sh base bq_rank   # a subset
#
# After the single-variant sweep, the multistream profile (S=2 streams of
# b8) runs the SAME window scan duplicated — compare ms/step per cloud.
# Then the runbook: flip winners, `python bench.py`, try `--batch 12/16`
# and `--streams 2`.
set -u
cd /root/repo
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=upb

run_variant () {
  local name="$1"; shift
  local dir="/tmp/bdm_prof_${name}"
  rm -rf "$dir"
  echo "=== variant: $name ($*) ==="
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
  timeout 600 python tools/parse_xplane.py "$dir" --iters 48 --agg 2>/dev/null | head -25
}

run_multistream () {
  local s="$1"
  local dir="/tmp/bdm_prof_ms${s}"
  rm -rf "$dir"
  echo "=== variant: multistream S=${s} (b8 each) ==="
  BDM_MS_STREAMS="$s" BDM_PROF_DIR="$dir" timeout 3000 python - <<PY
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bdm_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache(min_compile_secs=0.0)
from bdm_tpu.samplers import PC2Model, ProjectionConfig
from bdm_tpu.samplers.multistream import _window_scan_multi
from __graft_entry__ import _synthetic_batch
pc2 = PC2Model(ProjectionConfig(mixed_precision="bf16"))
params = pc2.init_params(jax.random.PRNGKey(0), num_points=1024)
rng = np.random.default_rng(0)
S = int(os.environ.get("BDM_MS_STREAMS", "2"))
batches = [_synthetic_batch(8, 4096, pc2.cfg.image_size,
                            np.random.default_rng(s)) for s in range(S)]
conds = []
for b in batches:
    c = pc2.conditioning_map(params, b["image"])
    conds.append(pc2.maybe_precontract(params, c))
xs = [jnp.asarray(np.random.default_rng(s).standard_normal(
    (8, 4096, 3)).astype(np.float32)) for s in range(S)]
cams = [b["camera"] for b in batches]
sched = pc2.schedulers["ddpm"]
ts = list(range(500, 484, -1))
keys = [jax.random.PRNGKey(1 + s) for s in range(S)]
def run(xs):
    return _window_scan_multi(pc2, params, xs, cams, conds, ts, sched,
                              keys)
t0 = time.time()
out = run(xs)
for o in out:
    o.block_until_ready()
print(f"compiled in {time.time()-t0:.0f}s", flush=True)
assert all(bool(np.isfinite(np.asarray(o)).all()) for o in out)
jax.profiler.start_trace(os.environ["BDM_PROF_DIR"])
for _ in range(3):
    o2 = run(xs)
    for o in o2:
        o.block_until_ready()
jax.profiler.stop_trace()
print(f"profiled (per-step totals are for {8*S} clouds, not 8)",
      flush=True)
PY
  timeout 600 python tools/parse_xplane.py "$dir" --iters 48 --agg 2>/dev/null | head -25
}

ALL="base zbuf_runmin prenorm nobarrier interp_mm bq_rank ms2"
SEL="${*:-$ALL}"
for v in $SEL; do
  case "$v" in
    base)        run_variant base NOOP=1 ;;
    zbuf_runmin) run_variant zbuf_runmin BDM_ZBUF=runmin ;;
    prenorm)     run_variant prenorm BDM_PRENORM_FUSE=1 ;;
    nobarrier)   run_variant nobarrier BDM_BARRIERS=0 ;;
    interp_mm)   run_variant interp_mm BDM_INTERP=onehot ;;
    bq_rank)     run_variant bq_rank BDM_BQ=rank ;;
    ms2)         run_multistream 2 ;;
    ms3)         run_multistream 3 ;;
    ms4)         run_multistream 4 ;;
    *) echo "unknown variant $v" ;;
  esac
done
