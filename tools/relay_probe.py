"""Microbenchmark of the axon TPU relay: per-transfer latency/bandwidth,
dispatch asynchrony, and per-leaf round-trip cost. Run EXCLUSIVELY (the
chip is single-claim). Informs the dispatch design in search_jax_log.

Usage: python tools/relay_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}")

    # 1. device_put latency vs size
    for size in (1 << 10, 1 << 17, 1 << 20, 1 << 23, 1 << 25):
        a = np.zeros(size, dtype=np.uint8)
        def put():
            jax.device_put(a).block_until_ready()
        dt = t(put, n=3)
        print(f"device_put {size/1e6:8.3f} MB: {dt*1e3:8.1f} ms "
              f"({size/dt/1e6:8.1f} MB/s)")

    # 2. does device_put block before block_until_ready?
    a = np.zeros(1 << 23, dtype=np.uint8)
    t0 = time.perf_counter()
    x = jax.device_put(a)
    t1 = time.perf_counter()
    x.block_until_ready()
    t2 = time.perf_counter()
    print(f"device_put(8MB) call={1e3*(t1-t0):.1f} ms, "
          f"ready after {1e3*(t2-t0):.1f} ms -> "
          f"{'ASYNC' if (t1-t0) < 0.5*(t2-t0) else 'BLOCKING'}")

    # 3. many small transfers vs one packed transfer (13 arrays ~ the
    # per-buffer dispatch of _dispatch_record)
    arrs = [np.zeros(1 << 16, dtype=np.int32) for _ in range(13)]
    packed = np.concatenate(arrs)
    def many():
        xs = [jax.device_put(a) for a in arrs]
        for x in xs:
            x.block_until_ready()
    def one():
        jax.device_put(packed).block_until_ready()
    print(f"13 x 256KB puts: {t(many, 3)*1e3:.1f} ms; "
          f"1 x 3.3MB put: {t(one, 3)*1e3:.1f} ms")

    # 4. jit dispatch asynchrony + tiny-result fetch latency
    @jax.jit
    def f(x):
        return jnp.sum(x) * 2

    xb = jax.device_put(np.zeros(1 << 20, dtype=np.int32))
    f(xb).block_until_ready()
    t0 = time.perf_counter()
    y = f(xb)
    t1 = time.perf_counter()
    y.block_until_ready()
    t2 = time.perf_counter()
    print(f"jit call={1e3*(t1-t0):.2f} ms, ready={1e3*(t2-t0):.2f} ms -> "
          f"{'ASYNC' if (t1-t0) < 0.5*(t2-t0) else 'BLOCKING'}")

    # 5. device_get latency vs size
    for size in (1 << 10, 1 << 20, 1 << 23):
        x = jax.device_put(np.zeros(size, dtype=np.uint8))
        x.block_until_ready()
        def get():
            np.asarray(x)
        dt = t(get, 3)
        print(f"device_get {size/1e6:8.3f} MB: {dt*1e3:8.1f} ms "
              f"({size/dt/1e6:8.1f} MB/s)")

    # 6. chained dispatches: N trivial jit calls back to back (per-step
    # kernel-launch overhead proxy)
    @jax.jit
    def g(x):
        return x + 1
    xb = jax.device_put(np.zeros(1 << 16, dtype=np.int32))
    g(xb).block_until_ready()
    def chain():
        y = xb
        for _ in range(20):
            y = g(y)
        y.block_until_ready()
    print(f"20 chained tiny jit calls: {t(chain, 3)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
