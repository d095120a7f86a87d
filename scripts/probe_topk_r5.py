"""Measure lax.top_k vs approx_max_k on the NMS selection shape
([B=128, 8400] f32, k=512) — quantifies the remaining selection
headroom (probe_slack_r5 split: selection 1.74 ms/batch)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax

B, A, K = 128, 8400, 512
rng = np.random.default_rng(0)
x0 = jax.device_put(rng.random((B, A), dtype=np.float32))

def timed(body, label, iters=50):
    @jax.jit
    def loop(x):
        def it(_, x):
            vals = body(x)
            dep = jnp.sum(vals[0].astype(jnp.float32)) * 1e-30
            return x + dep.astype(x.dtype)
        return lax.fori_loop(0, iters, it, x)
    out = loop(x0); _ = np.asarray(out[0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x0); _ = np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{label:<28} {best:7.3f} ms/batch", flush=True)
    return best

base = timed(lambda x: (x * 1.0000001,), "carry floor")
t_exact = timed(lambda x: lax.top_k(x, K), "lax.top_k(512)")
t_approx = timed(lambda x: lax.approx_max_k(x, K), "approx_max_k(512) r=0.95")
t_ax1 = timed(lambda x: lax.approx_max_k(x, K, recall_target=0.999),
              "approx_max_k r=0.999")
print(f"deltas: exact {t_exact-base:.3f} | approx.95 {t_approx-base:.3f} "
      f"| approx.999 {t_ax1-base:.3f}", flush=True)
