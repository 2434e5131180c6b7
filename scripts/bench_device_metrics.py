"""Cost of the in-graph epoch diagnostics at the flagship/trainval shape.

`_device_batch_metrics` (overall + 7 per-class tie-corrected APs) runs once
per scanned-epoch step. The naive form pays 8 argsorts of the same [B*E]
score vector (overall + one per vmapped class mask); this harness measures
the metrics body alone on the real chip via differential in-jit repetition
timing (CLAUDE.md relay rules) to decide whether a shared-sort form is
worth it — at (256, 4096) x 8 the scores vector is 32k elements.

Run: python scripts/bench_device_metrics.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from batch3dmot_tpu.config import TRACKING_CLASSES
from batch3dmot_tpu.train.metrics import (
    average_precision,
    average_precision_multi,
)


def diff_time(fn, args, reps_a=1, reps_b=33):
    def make(reps):
        @jax.jit
        def run(*a):
            def rep(c, _):
                return c + fn(c, *a) * 1e-30, None

            c, _ = jax.lax.scan(rep, jnp.float32(0.0), None, length=reps)
            return c

        return run

    out = {}
    for reps in (reps_a, reps_b):
        r = make(reps)
        np.asarray(r(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r(*args))
            best = min(best, time.perf_counter() - t0)
        out[reps] = best
    return (out[reps_b] - out[reps_a]) / (reps_b - reps_a)


def metrics_naive(c, s, y, mask, edge_class, cids):
    s = s + c * 0.0
    sel = mask[None, :] & (edge_class[None, :] == cids[:, None])
    ap_all = average_precision(s, y, mask)
    ap_cls = jax.vmap(lambda m: average_precision(s, y, m))(sel)
    return ap_all + jnp.nansum(ap_cls)


def main():
    B, E = 8, 4096
    rng = np.random.default_rng(0)
    n = B * E
    s = jnp.asarray(rng.random(n, dtype=np.float32))
    y = jnp.asarray((rng.random(n) < 0.3).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.8)
    edge_class = jnp.asarray(rng.integers(1, 8, n, dtype=np.int32))
    cids = jnp.asarray(list(TRACKING_CLASSES.values()))
    args = (s, y, mask, edge_class, cids)

    t = diff_time(metrics_naive, args)
    print(f"metrics naive (8 sorts, [{B}x{E}]): {t * 1e3:.3f} ms")

    t1 = diff_time(
        lambda c, s, y, m, ec, ci: average_precision(s + c * 0.0, y, m),
        args,
    )
    print(f"single overall AP (1 sort):        {t1 * 1e3:.3f} ms")

    def metrics_multi(c, s, y, mask, edge_class, cids):
        s = s + c * 0.0
        sel = mask[None, :] & (edge_class[None, :] == cids[:, None])
        aps = average_precision_multi(
            s, y, jnp.concatenate([mask[None, :], sel], axis=0)
        )
        return jnp.nansum(aps)

    t2 = diff_time(metrics_multi, args)
    print(f"metrics multi (shared sort):       {t2 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
