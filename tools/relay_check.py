"""Ground-truth the timing methodology on the axon relay backend.

Round-2 tools disagree wildly on identical ops (point_covariances: 155 ms vs
0.04 ms per 16-cloud dispatch) so before optimizing anything we establish, on
a known-FLOP workload (4096^3 f32 matmul, 137 GFLOP):

  1. does jax.block_until_ready actually block?
  2. does the relay dedup repeated dispatches on (a) the same buffers,
     (b) fresh buffers with identical content, (c) perturbed content?
  3. per-op time from a DEPENDENT chain (each op consumes the previous
     output — cannot be deduped or overlapped) = the trustworthy number.

Run: python tools/relay_check.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def fetch(x):
    """Force completion by pulling one element to host."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    n = 4096
    flops = 2 * n**3
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    mm = jax.jit(lambda a, b: a @ b)
    out = mm(A, B)
    fetch(out)  # compile + settle

    # --- 1. dependent chain: C_{i+1} = normalize(C_i) @ B. Sequential by
    # construction; per-op time is total/len. The normalize keeps values
    # bounded; its cost is negligible vs the matmul.
    chain = jax.jit(lambda c, b: (c / jnp.float32(n)) @ b)
    c = chain(A, B)
    fetch(c)
    reps = 8
    t0 = time.time()
    for _ in range(reps):
        c = chain(c, B)
    fetch(c)
    dt_chain = (time.time() - t0) / reps
    print(f"[relay] dependent chain      : {dt_chain*1000:8.2f} ms/op "
          f"({flops/dt_chain/1e12:.1f} TFLOP/s f32)")

    # --- 2. independent repeats, SAME buffers, block_until_ready
    t0 = time.time()
    o = None
    for _ in range(reps):
        o = mm(A, B)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / reps
    print(f"[relay] same-buf + block     : {dt*1000:8.2f} ms/op")

    # --- 3. independent repeats, SAME buffers, fetch last
    t0 = time.time()
    for _ in range(reps):
        o = mm(A, B)
    fetch(o)
    dt = (time.time() - t0) / reps
    print(f"[relay] same-buf + fetch     : {dt*1000:8.2f} ms/op")

    # --- 4. fresh buffers, identical content
    As = [jnp.asarray(np.asarray(A)) for _ in range(reps)]
    for a in As:
        a.block_until_ready()
    t0 = time.time()
    for a in As:
        o = mm(a, B)
    fetch(o)
    dt = (time.time() - t0) / reps
    print(f"[relay] fresh-buf same conten: {dt*1000:8.2f} ms/op")

    # --- 5. fresh buffers, perturbed content (the round-2 jiggle)
    Ap = [A + jnp.float32(i * 1e-9) for i in range(reps)]  # may round to A!
    jax.block_until_ready(Ap)
    t0 = time.time()
    for a in Ap:
        o = mm(a, B)
    fetch(o)
    dt = (time.time() - t0) / reps
    print(f"[relay] fresh-buf +i*1e-9    : {dt*1000:8.2f} ms/op")

    # --- 6. fresh buffers, REAL perturbation (above f32 eps)
    Aq = [A * (1.0 + jnp.float32(i) * jnp.float32(1e-6)) for i in range(reps)]
    jax.block_until_ready(Aq)
    t0 = time.time()
    for a in Aq:
        o = mm(a, B)
    fetch(o)
    dt = (time.time() - t0) / reps
    print(f"[relay] fresh-buf *（1+i*1e-6): {dt*1000:8.2f} ms/op")

    # --- 7. does block_until_ready block? dispatch one, measure gap
    # between dispatch-return and fetch-complete.
    t0 = time.time()
    o = mm(A, B)
    t_dispatch = time.time() - t0
    jax.block_until_ready(o)
    t_block = time.time() - t0
    fetch(o)
    t_fetch = time.time() - t0
    print(f"[relay] dispatch={t_dispatch*1000:.2f} ms, "
          f"+block={t_block*1000:.2f} ms, +fetch={t_fetch*1000:.2f} ms")


if __name__ == "__main__":
    main()
