#!/usr/bin/env python
"""End-to-end sorted-wrapper variants (the only numbers to trust)."""
import sys, time
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
N = 2560 * 1440


def timeit(name, fn, *args, reps=6):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.uint32)
    o = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3))
    d = jax.random.uniform(jax.random.fold_in(key, 2), (N, 3))
    tn = jnp.zeros((N,))
    tx = jnp.ones((N,))
    iota = jnp.arange(N, dtype=jnp.int32)

    def fake_query(os_, ds_, tns, txs):
        # stand-in for the intersector: an OPAQUE op so XLA cannot fold the
        # sort/unsort permutations through it (the real pallas_call is opaque)
        os_, ds_, tns, txs = jax.lax.optimization_barrier((os_, ds_, tns, txs))
        return jax.lax.optimization_barrier(os_[:, 0] + ds_[:, 0] + tns + txs)

    def w_current(keys, o, d, tn, tx):
        order = jnp.argsort(keys)
        packed = jnp.concatenate([o, d, tn[:, None], tx[:, None]], axis=1)[order]
        res = fake_query(packed[:, 0:3], packed[:, 3:6], packed[:, 6],
                         packed[:, 7])
        inv = jnp.argsort(order)
        return res[inv]

    def w_unstable_scatterinv(keys, o, d, tn, tx):
        order = jnp.argsort(keys, stable=False)
        packed = jnp.concatenate([o, d, tn[:, None], tx[:, None]], axis=1)[order]
        res = fake_query(packed[:, 0:3], packed[:, 3:6], packed[:, 6],
                         packed[:, 7])
        return jnp.zeros((N,), res.dtype).at[order].set(res)

    def w_payload_sort(keys, o, d, tn, tx):
        srt = jax.lax.sort(
            (keys, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             tn, tx, iota), num_keys=1, is_stable=False)
        res = fake_query(jnp.stack(srt[1:4], 1), jnp.stack(srt[4:7], 1),
                         srt[7], srt[8])
        return jnp.zeros((N,), res.dtype).at[srt[9]].set(res)

    def w_nosort(keys, o, d, tn, tx):
        return fake_query(o, d, tn, tx)

    for name, fn in (("current (2 argsorts + 2 gathers)", w_current),
                     ("unstable argsort + scatter unsort", w_unstable_scatterinv),
                     ("payload sort + scatter unsort", w_payload_sort),
                     ("no sort (floor)", w_nosort)):
        timeit(name, fn, keys, o, d, tn, tx)


if __name__ == "__main__":
    main()
