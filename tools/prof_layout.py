"""Measure (R,3) vs (3,R) vs flat elementwise cost + extract sub-blocks."""
import time
import jax, jax.numpy as jnp

R = 2560 * 1440
key = jax.random.PRNGKey(0)
a3 = jax.random.normal(key, (R, 3))
a3t = a3.T.copy()
jax.block_until_ready(a3t)


def timeit(name, f, *args, n=6):
    g = jax.jit(f)
    r = g(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def norm_chain(x):  # a few fused elementwise passes over (R,3)
    for _ in range(4):
        x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-9)
        x = x * 1.0001 + 0.0001
    return x

def norm_chain_t(x):  # (3,R)
    for _ in range(4):
        x = x / jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True) + 1e-9)
        x = x * 1.0001 + 0.0001
    return x

timeit("norm chain (R,3)", norm_chain, a3)
timeit("norm chain (3,R)", norm_chain_t, a3t)

# barycentric interp like extract: att (R,9) -> (R,3,3) -> weighted sum
att9 = jax.random.normal(key, (R, 9))
u = jax.random.uniform(key, (R,)); v = jax.random.uniform(key, (R,))
def interp(att9, u, v):
    n3 = att9.reshape(-1, 3, 3)
    w = (1.0 - u - v)[:, None]
    return w * n3[:, 0] + u[:, None] * n3[:, 1] + v[:, None] * n3[:, 2]
timeit("barycentric (R,9)->(R,3)", interp, att9, u, v)

def interp_flat(att9, u, v):
    w = (1.0 - u - v)
    cols = []
    for c in range(3):
        cols.append(w * att9[:, c] + u * att9[:, 3 + c] + v * att9[:, 6 + c])
    return jnp.stack(cols, axis=-1)
timeit("barycentric cols", interp_flat, att9, u, v)

# one fused write of (R,3)
timeit("copy (R,3)", lambda x: x * 1.000001, a3)
timeit("copy (3,R)", lambda x: x * 1.000001, a3t)
timeit("copy (R,)", lambda x: x * 1.000001, a3[:, 0].copy())
