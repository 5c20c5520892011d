"""Decisive relay-timing test: dependent chains with scalar fetch.

Methodology question from relay_check.py: does jax.block_until_ready wait for
execution on the axon relay, or only flush the queue? Distinguish with a
DEPENDENT chain of matmuls whose final value is reduced to a scalar IN-GRAPH
(4-byte fetch, no transfer pollution):

  Story A (block waits): chain+block == chain+scalar-fetch == true ms/op.
  Story B (block lies):  chain+block << chain+scalar-fetch; only the
                         scalar-fetch number is real.

Also calibrates achievable f32/bf16 matmul TFLOP/s for the roofline.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def main():
    n = 4096
    flops = 2 * n**3
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    # One jit program: k dependent matmuls, scalar out.
    def chain_k(k):
        @jax.jit
        def f(c, b):
            for _ in range(k):
                c = (c / jnp.float32(n)) @ b
            return jnp.sum(c)
        return f

    for k in (1, 9):
        f = chain_k(k)
        s = f(A, B)
        float(s)  # compile + settle
        t0 = time.time()
        s = f(A, B)
        jax.block_until_ready(s)
        t_block = time.time() - t0
        t0 = time.time()
        s = f(A, B)
        float(s)
        t_fetch = time.time() - t0
        print(f"[relay2] chain k={k}: block={t_block*1000:8.2f} ms "
              f"fetch={t_fetch*1000:8.2f} ms")

    # Slope method: (t(9) - t(1)) / 8 = true per-matmul time, overheads cancel.
    f1, f9 = chain_k(1), chain_k(9)
    float(f1(A, B)); float(f9(A, B))
    reps = 3
    t1 = t9 = 0.0
    for _ in range(reps):
        t0 = time.time(); float(f1(A, B)); t1 += time.time() - t0
        t0 = time.time(); float(f9(A, B)); t9 += time.time() - t0
    per_op = (t9 - t1) / (8 * reps)
    print(f"[relay2] f32 4096^3 matmul: {per_op*1000:.2f} ms/op "
          f"= {flops/per_op/1e12:.1f} TFLOP/s f32")

    # bf16 calibration (MXU native).
    Ab, Bb = A.astype(jnp.bfloat16), B.astype(jnp.bfloat16)
    def chain_bf(k):
        @jax.jit
        def f(c, b):
            for _ in range(k):
                c = ((c / 64.0) @ b).astype(jnp.bfloat16)
            return jnp.sum(c.astype(jnp.float32))
        return f
    g1, g9 = chain_bf(1), chain_bf(9)
    float(g1(Ab, Bb)); float(g9(Ab, Bb))
    t1 = t9 = 0.0
    for _ in range(reps):
        t0 = time.time(); float(g1(Ab, Bb)); t1 += time.time() - t0
        t0 = time.time(); float(g9(Ab, Bb)); t9 += time.time() - t0
    per_op = (t9 - t1) / (8 * reps)
    print(f"[relay2] bf16 4096^3 matmul: {per_op*1000:.2f} ms/op "
          f"= {flops/per_op/1e12:.1f} TFLOP/s bf16")

    # HBM bandwidth calibration: big elementwise op (read+write 2x256MB).
    big = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)).astype(np.float32))
    def ew_k(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = x * 1.0000001 + 1e-7
            return jnp.sum(x)
        return f
    e1, e9 = ew_k(1), ew_k(9)
    float(e1(big)); float(e9(big))
    t1 = t9 = 0.0
    for _ in range(reps):
        t0 = time.time(); float(e1(big)); t1 += time.time() - t0
        t0 = time.time(); float(e9(big)); t9 += time.time() - t0
    per_op = (t9 - t1) / (8 * reps)
    bytes_moved = big.size * 4 * 2  # read + write per op
    print(f"[relay2] elementwise 256MB: {per_op*1000:.2f} ms/op "
          f"= {bytes_moved/per_op/1e9:.0f} GB/s HBM")

    # Random-gather calibration (the probe stage's bound): 2^20 gathers of
    # int32 from a 400k-row table, chained.
    tbl = jnp.asarray(rng.integers(0, 400000, size=(400000,), dtype=np.int32))
    idx0 = jnp.asarray(rng.integers(0, 400000, size=(1 << 20,), dtype=np.int32))
    def gather_k(k):
        @jax.jit
        def f(idx):
            for _ in range(k):
                idx = tbl[idx]  # dependent gathers
            return jnp.sum(idx.astype(jnp.int64))
        return f
    g1, g9 = gather_k(1), gather_k(9)
    float(g1(idx0)); float(g9(idx0))
    t1 = t9 = 0.0
    for _ in range(reps):
        t0 = time.time(); float(g1(idx0)); t1 += time.time() - t0
        t0 = time.time(); float(g9(idx0)); t9 += time.time() - t0
    per_op = (t9 - t1) / (8 * reps)
    print(f"[relay2] 1M random int32 gathers: {per_op*1000:.2f} ms/op "
          f"= {(1<<20)/per_op/1e9:.2f} G gathers/s")


if __name__ == "__main__":
    main()
