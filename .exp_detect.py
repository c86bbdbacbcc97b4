import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from benchmarks.bench_suite import _sync_tunnel, _timeit_sync
from ptzjax.kernels.detect import harris_response, _nms3, _subpixel

rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(720, 1280)).astype(np.float32))
resp = harris_response(img); sup = _nms3(resp)
jax.block_until_ready(sup)
_sync_tunnel()

def slope(make, n_s=8, n_b=64):
    f_s, a_s = make(n_s); f_b, a_b = make(n_b)
    t_s = _timeit_sync(f_s, *a_s); t_b = _timeit_sync(f_b, *a_b)
    return (t_b - t_s) / (n_b - n_s)

def mk_topk(n):
    sups = jnp.stack([sup + i*1e-9 for i in range(n)])
    return jax.jit(lambda xs: jax.lax.map(
        lambda s: jax.lax.approx_max_k(s.reshape(-1), 512, recall_target=0.99)[0], xs)), (sups,)
print("approx_max_k k=512:", round(slope(mk_topk), 4), "ms", flush=True)

def mk_topk256(n):
    sups = jnp.stack([sup + i*1e-9 for i in range(n)])
    return jax.jit(lambda xs: jax.lax.map(
        lambda s: jax.lax.approx_max_k(s.reshape(-1), 256, recall_target=0.99)[0], xs)), (sups,)
print("approx_max_k k=256:", round(slope(mk_topk256), 4), "ms", flush=True)

idx = jnp.asarray(rng.integers(0, 720*1280, 512), jnp.int32)
ys = idx // 1280; xs = idx % 1280
def mk_subpix(n):
    resps = jnp.stack([resp + i*1e-9 for i in range(n)])
    return jax.jit(lambda rs: jax.lax.map(
        lambda r: _subpixel(r, ys, xs)[0], rs)), (resps,)
print("subpixel 512kp:", round(slope(mk_subpix), 4), "ms", flush=True)
