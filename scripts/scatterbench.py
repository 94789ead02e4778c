"""Micro-benchmark of XLA:TPU scatter/gather primitives for this workload.

Informs the coefficient-materialization design (see BENCH.md): element
scatter cost per slot (sorted vs unsorted), windowed row-scatter cost per
index, and gather cost. Run on the real device.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    total = 18_288_512 + 64  # 12 MP coefficient stream
    out = {"backend": jax.default_backend()}
    rng = np.random.default_rng(0)

    def probe(name, fn, *args):
        # slice ON DEVICE before converting: full-buffer D2H over the
        # development tunnel costs ~1 s and would swamp every number
        sliced = lambda *a: fn(*a).reshape(-1)[:1]
        exe = jax.jit(sliced).lower(*args).compile()
        r = lambda: np.asarray(exe(*args))
        t0 = time.time()
        out[name] = timeit(r) * 1e3
        print(f"{name}: {out[name]:.2f} ms (compile+warm {time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)

    # baseline: jitted add on the output-size buffer (bandwidth floor)
    buf = jnp.zeros(total, jnp.int16)
    probe("touch_38mb_ms", lambda b: b + jnp.int16(1), buf)

    for n_slots in (1 << 20, 4 << 20, 13 << 20):
        name = f"elem_scatter_{n_slots >> 20}m"
        idx = np.sort(rng.integers(0, total - 1, n_slots)).astype(np.int32)
        vals = rng.integers(-100, 100, n_slots).astype(np.int16)
        di = jnp.asarray(idx)
        dv = jnp.asarray(vals)

        def f_unsorted(i, v):
            return jnp.zeros(total, jnp.int16).at[i].add(
                v, mode="drop", unique_indices=False)

        def f_sorted(i, v):
            return jnp.zeros(total, jnp.int16).at[i].add(
                v, mode="drop", indices_are_sorted=True)

        probe(name, f_unsorted, di, dv)
        probe(name + "_sorted", f_sorted, di, dv)

    # windowed scatter-add: L indices, (D, 64) int16 windows
    n_du = total // 64
    for L, D in ((32768, 32), (131072, 8)):
        idx = np.sort(rng.integers(0, n_du - D, L)).astype(np.int32)
        upd = rng.integers(-100, 100, (L, D, 64)).astype(np.int16)
        di = jnp.asarray(idx)[:, None]
        du = jnp.asarray(upd)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))

        def f_win(i, u):
            o = jnp.zeros((n_du + D, 64), jnp.int16)
            return jax.lax.scatter_add(
                o, i, u, dn, indices_are_sorted=True, unique_indices=False)

        probe(f"win_scatter_{L}x{D}x64", f_win, di, du)

    # gather: 4M random int16
    gi = jnp.asarray(rng.integers(0, total, 4 << 20).astype(np.int32))
    src = jnp.asarray(rng.integers(-100, 100, total).astype(np.int16))
    probe("gather_4m", lambda s, i: s[i], src, gi)

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
