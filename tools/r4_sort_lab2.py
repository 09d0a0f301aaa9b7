#!/usr/bin/env python
"""Sort-wrapper gather cost: encodings of the (R,8) row gather."""
import sys, time
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
N = 2560 * 1440


def timeit(name, fn, *args, reps=6):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    keys32 = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.int32)
    payload = jax.random.uniform(jax.random.fold_in(key, 1), (N, 8))
    order = jnp.argsort(keys32)

    timeit("(R,) f32 gather", lambda o, p: p[:, 0][o], order, payload)
    timeit("(R,8) f32 row gather", lambda o, p: p[o], order, payload)
    timeit("(R,4) f64 bitcast gather", lambda o, p: jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(p.reshape(N, 4, 2), jnp.float64)[o],
        jnp.float32).reshape(N, 8), order, payload)
    timeit("(R,16) f32 row gather", lambda o, p: jnp.concatenate(
        [p, p], axis=1)[o], order, payload)
    iota = jnp.arange(N, dtype=jnp.int32)
    timeit("sort w/ 9 payload operands", lambda k, p: jax.lax.sort(
        (k,) + tuple(p[:, i] for i in range(8)) + (iota,), num_keys=1,
        is_stable=False)[1], keys32, payload)
    # gather via dynamic_slice-free one-shot take along sorted segments?
    timeit("take(axis=0) explicit", lambda o, p: jnp.take(
        p, o, axis=0, unique_indices=True, indices_are_sorted=False),
        order, payload)


if __name__ == "__main__":
    main()
