"""Profile the production 16-step PC2 window scan (bf16) on the TPU.

Run ON the TPU terminal (single job). Trace dir /tmp/bdm_prof_cur; parse
with: python tools/parse_xplane.py /tmp/bdm_prof_cur --iters 48 --agg
(3 traced scans x 16 steps). Conv impl switch: BDM_CONV_IMPL=slab|ms|xla."""
import jax, jax.numpy as jnp, numpy as np, time
jax.config.update("jax_compilation_cache_dir", "/tmp/bdm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import sys; sys.path.insert(0, "/root/repo")
from bdm_tpu.samplers import PC2Model, ProjectionConfig
from __graft_entry__ import _synthetic_batch

pc2 = PC2Model(ProjectionConfig(mixed_precision="bf16"))
params = pc2.init_params(jax.random.PRNGKey(0), num_points=1024)
rng = np.random.default_rng(0)
b, n = 8, 4096
batch = _synthetic_batch(b, n, pc2.cfg.image_size, rng)
cond = pc2.conditioning_map(params, batch["image"])
cond = pc2.maybe_precontract(params, cond)
x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
sched = pc2.schedulers["ddpm"]
ts = list(range(500, 484, -1))
k = jax.random.PRNGKey(1)

def run(x):
    return pc2._window_scan(params, x, batch["camera"], cond, ts, sched, k)

out = run(x); out.block_until_ready()  # compile
print("compiled", flush=True)
jax.profiler.start_trace("/tmp/bdm_prof_cur")
for _ in range(3):
    x2 = run(x); x2.block_until_ready()
jax.profiler.stop_trace()
print("profiled", flush=True)
