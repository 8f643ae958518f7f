import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
B, W, GRID = 256, 256, 512

def raw_lse(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))

def raw_lse_log(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log(1.0 + jnp.exp(-jnp.abs(a - b)))

def chain_kernel(iters, f):
    def body(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = a_ref[:]
        x = o_ref[:]; a = a_ref[:]
        for _ in range(iters):
            x = f(x, a)
        o_ref[:] = x
    @jax.jit
    def run(ab):
        a, b = ab
        return pl.pallas_call(body, grid=(GRID,),
            in_specs=[pl.BlockSpec((B, W), lambda g: (0, 0))]*2,
            out_specs=pl.BlockSpec((B, W), lambda g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32))(a, b)
    return run
rng = np.random.default_rng(7)
va = [(jnp.asarray(rng.standard_normal((B,W)), jnp.float32)*0.1,
       jnp.asarray(-np.abs(rng.standard_normal((B,W))), jnp.float32)) for _ in range(4)]
def td(fn):
    np.asarray(fn(va[0]))
    ts=[]
    for i in range(1,4):
        t0=time.perf_counter(); np.asarray(fn(va[i])); ts.append(time.perf_counter()-t0)
    return float(np.median(ts))
# bitwise check vs jnp.logaddexp on representative values incl f32-min sentinels
NEG = float(np.finfo(np.float32).min)
av = np.asarray(rng.standard_normal(8192)*30, np.float32); av[::7] = NEG
bv = np.asarray(rng.standard_normal(8192)*30, np.float32); bv[::11] = NEG
r1 = np.asarray(jnp.logaddexp(av, bv))
r2 = np.asarray(raw_lse(jnp.asarray(av), jnp.asarray(bv)))
print("bitwise equal vs jnp.logaddexp:", np.array_equal(r1, r2))
for name, f in (("jnp.logaddexp", jnp.logaddexp), ("raw_lse", raw_lse), ("raw_lse_log", raw_lse_log)):
    lo = td(chain_kernel(64, f)); hi = td(chain_kernel(256, f))
    per = (hi-lo)/192/GRID
    print(f"[{name}] {per*1e9:.2f} ns per [256,256] step ({per/(17.32e-9/2):.1f} ALU-op eq)", flush=True)
