import time, jax, jax.numpy as jnp
from e3dge_tpu.ops import grid_sample, grid_sample_mm

B, C, H, W, N = 4, 269, 64, 64, 98304
x = jnp.zeros((B, C, H, W), jnp.bfloat16)
grid = (jax.random.uniform(jax.random.key(0), (B, N, 1, 2)) * 2 - 1).astype(jnp.float32)

def timeit(f, *a):
    out = f(*a); _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(8):
        out = f(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / 8 * 1e3

for name, fn in (("gather", grid_sample), ("mm", grid_sample_mm)):
    fwd = jax.jit(lambda x, g, fn=fn: fn(x, g))
    # grad wrt features only (grid stopped)
    gf = jax.jit(jax.grad(lambda x, g, fn=fn: fn(x, jax.lax.stop_gradient(g)).astype(jnp.float32).sum()))
    # grad wrt features AND grid
    gfg = jax.jit(jax.grad(lambda x, g, fn=fn: fn(x, g).astype(jnp.float32).sum(), argnums=(0, 1)))
    print(name, "fwd", round(timeit(fwd, x, grid), 2),
          "bwd_feat", round(timeit(gf, x, grid), 2),
          "bwd_feat+grid", round(timeit(gfg, x, grid), 2), flush=True)
