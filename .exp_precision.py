"""Measure: (a) HIGHEST vs HIGH vs DEFAULT matmul cost at EKF shapes,
(b) XLA cholesky cost at 256/512, (c) numerical error of HIGH vs HIGHEST
on the EKF update algebra vs fp64."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

_ = float(jnp.zeros(()))  # sync tunnel

def timeit(f, *a, n=5):
    def once():
        t0 = time.perf_counter()
        r = f(*a)
        _ = float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        return time.perf_counter() - t0
    once()
    return min(once() for _ in range(n)) * 1e3

rng = np.random.default_rng(0)
D, M = 518, 512
A = jnp.asarray(rng.normal(size=(D, M)).astype(np.float32))
B = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32))

# batch-slope over n sequential matmuls inside a scan
def mk(n, prec):
    def run(a, b):
        def body(x, _):
            return jnp.matmul(x, b, precision=prec) * 1e-2, 0.0
        x, _ = jax.lax.scan(body, a, jnp.zeros((n,)))
        return x
    return jax.jit(run)

for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                   ("HIGH", jax.lax.Precision.HIGH),
                   ("HIGHEST", jax.lax.Precision.HIGHEST)]:
    f8, f64 = mk(8, prec), mk(64, prec)
    t8 = timeit(f8, A, B); t64 = timeit(f64, A, B)
    per = (t64 - t8) / 56
    print(f"matmul (518x512)@(512x512) {name}: {per*1e3:.1f} us/op", flush=True)

# cholesky cost
for n in (256, 512):
    S = rng.normal(size=(n, n)).astype(np.float32)
    S = jnp.asarray(S @ S.T + n * np.eye(n, dtype=np.float32))
    def mkc(k):
        def run(s):
            def body(x, _):
                l = jnp.linalg.cholesky(x)
                return s + 1e-6 * l, 0.0
            x, _ = jax.lax.scan(body, s, jnp.zeros((k,)))
            return x
        return jax.jit(run)
    t8 = timeit(mkc(8), S); t64 = timeit(mkc(64), S)
    print(f"cholesky {n}: {(t64-t8)/56*1e3:.1f} us/op", flush=True)

# numerical: HIGH vs HIGHEST error on S build + gain at EKF value scales
P64 = rng.normal(size=(D, D)) * 1.0
P64 = P64 @ P64.T / D + np.eye(D) * 1e-4
H64 = np.zeros((M, D))
H64[:, :3] = rng.normal(size=(M, 3)) * np.array([2000.0, 2000.0, 0.3])
for i in range(M // 2):
    H64[i, 6 + i] = rng.normal() * 2000.0
    H64[M // 2 + i, 6 + (M // 2) + i] = rng.normal() * 2000.0
S64 = H64 @ P64 @ H64.T + np.eye(M)
K64 = P64 @ H64.T @ np.linalg.inv(S64)
Pf = jnp.asarray(P64.astype(np.float32)); Hf = jnp.asarray(H64.astype(np.float32))
for name, prec in [("HIGH", jax.lax.Precision.HIGH), ("HIGHEST", jax.lax.Precision.HIGHEST)]:
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    Sf = mm(mm(Hf, Pf), Hf.T) + jnp.eye(M)
    L = jnp.linalg.cholesky(Sf)
    from ptzjax.ekf import _inv_lower
    il = _inv_lower(L)
    Kf = mm(mm(mm(Pf, Hf.T), il.T), il)
    es = np.abs(np.asarray(Sf, np.float64) - S64).max() / np.abs(S64).max()
    ek = np.abs(np.asarray(Kf, np.float64) - K64).max() / np.abs(K64).max()
    print(f"{name}: S rel err {es:.2e}, K rel err {ek:.2e}", flush=True)
