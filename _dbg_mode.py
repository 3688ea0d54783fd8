import jax, sys
sys.argv = ["x"]
import e3dge_tpu.models.pifu.local_net as ln
orig_g, orig_m = ln.grid_sample, ln.grid_sample_mm
ln.grid_sample = lambda x, g, *a, **k: (print("GATHER", x.dtype, x.shape, g.shape, flush=True), orig_g(x, g, *a, **k))[1]
ln.grid_sample_mm = lambda x, g, *a, **k: (print("MM", x.dtype, x.shape, g.shape, flush=True), orig_m(x, g, *a, **k))[1]

sys.path.insert(0, ".")
import scripts.profile_train as pt
import jax.numpy as jnp
cfg, model, variables, ml, state, step = pt.build_cycle(2, **dict(renderer_kwargs=dict(sample_field_dtype="bfloat16", field_dtype="bfloat16")))
key = jax.random.key(7)
print("lowering...", flush=True)
lowered = step.lower(state, ml, key, 2)
print("done", flush=True)
