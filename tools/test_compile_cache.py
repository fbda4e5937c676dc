"""Probe: does the JAX persistent compilation cache work over the axon
TPU tunnel? Run twice in fresh processes; the second run should skip the
XLA compile if the PJRT client supports executable serialization.

Usage: python tools/test_compile_cache.py /tmp/jaxcache
Prints one line: compile_s=<wall of first jit call>.
"""

import sys
import time

import jax

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp


@jax.jit
def f(x):
    # Big-ish program so the compile is measurably slow over the tunnel:
    # a chain of stencil sweeps XLA can't collapse.
    def body(i, a):
        s = (
            jnp.roll(a, 1, 0)
            + jnp.roll(a, -1, 0)
            + jnp.roll(a, 1, 1)
            + jnp.roll(a, -1, 1)
        )
        return 0.25 * s + jnp.sin(a) * 1e-3

    return jax.lax.fori_loop(0, 50, body, x) * 2.0 + jnp.tanh(x)


x = jnp.ones((2048, 2048), jnp.float32)
t0 = time.perf_counter()
y = f(x)
val = float(jnp.sum(y[:1, :1]))
t = time.perf_counter() - t0
print(f"compile_s={t:.2f} device={jax.devices()[0].platform} probe={val:.3f}")
