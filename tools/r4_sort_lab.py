#!/usr/bin/env python
"""Round-4 sort lab: the 9 per-frame argsorts cost ~107 ms each (~1/3 of the
2913 ms frame). Price the alternatives on-chip."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 2560 * 1440


def timeit(name, fn, *args, reps=6):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    keys32 = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.int32
                                ).astype(jnp.uint32)
    payload = jax.random.uniform(jax.random.fold_in(key, 1), (N, 8))

    timeit("argsort u32", jax.jit(lambda k: jnp.argsort(k)), keys32)
    timeit("argsort u32 stable=False",
           jax.jit(lambda k: jnp.argsort(k, stable=False)), keys32)
    iota = jnp.arange(N, dtype=jnp.int32)
    timeit("lax.sort_key_val", jax.jit(
        lambda k: jax.lax.sort_key_val(k, iota)[1]), keys32)
    timeit("lax.sort (unstable, 1 key)", jax.jit(
        lambda k: jax.lax.sort((k, iota), num_keys=1, is_stable=False)[1]),
        keys32)
    keys16 = (keys32 >> 8).astype(jnp.uint16)
    timeit("argsort u16 stable=False",
           jax.jit(lambda k: jnp.argsort(k, stable=False)), keys16)

    order = jnp.argsort(keys32)
    timeit("gather packed (R,8)", jax.jit(lambda o, p: p[o]), order, payload)
    timeit("invert via argsort", jax.jit(lambda o: jnp.argsort(o)), order)
    timeit("invert via scatter", jax.jit(
        lambda o: jnp.zeros((N,), jnp.int32).at[o].set(iota)), order)

    # full wrapper cost (prep + query-identity + unsort)
    def wrapper(k, p):
        o = jnp.argsort(k, stable=False)
        sp = p[o]
        inv = jnp.zeros((N,), jnp.int32).at[o].set(iota)
        return sp[:, 0][inv]
    timeit("wrapper: sort+gather+scatter-inv+gather", jax.jit(wrapper),
           keys32, payload)


if __name__ == "__main__":
    main()
