"""Probe: frozen-encoder inference dtype/precision on the real chip.

The headline bench sweep is ~88% scene-encode (2712 edges amortize over
4x 128-detection encodes at demo density), so encoder dtype is a
candidate lever. Three variants:

  * f32-default  — f32 tensors, JAX default matmul precision (on TPU the
    MXU already ingests bf16 with f32 accumulation)
  * f32-highest  — f32 tensors, full-f32 matmuls (6-pass) — the floor
  * bf16         — params+activations cast to bf16 (halves HBM traffic)

Measures differential in-jit timings (relay-safe: difference two in-jit
repetition counts; best-of-6) and embedding deltas vs f32-highest.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.models import MultimodalGNN

# Batch size sweeps via argv (round-3 VERDICT next #4: the original probe
# ran only the demo-scale 128; trainval scenes encode 1024-2048 detections
# and encode is ~88% of the headline sweep there).
M_PAD = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS_A = 4
REPS_B = max(12, min(68, 8192 // M_PAD))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((M_PAD, 32, 32, 3), dtype=np.float32))
    lidar = jnp.asarray(rng.standard_normal((M_PAD, 128, 3)).astype(np.float32))
    radar = jnp.asarray(rng.standard_normal((M_PAD, 64, 4)).astype(np.float32))

    model = MultimodalGNN()
    example = (img[:2], lidar[:2], radar[:2])
    variables = jax.jit(
        lambda k: model.init(k, *example, method=model.encode_frozen)
    )(jax.random.key(0))
    jax.block_until_ready(variables)

    def encode(v, im, li, ra, dtype, precision):
        with jax.default_matmul_precision(precision):
            if dtype is not None:
                v = jax.tree.map(lambda a: a.astype(dtype), v)
                im, li, ra = (x.astype(dtype) for x in (im, li, ra))
            return model.apply(v, im, li, ra, method=model.encode_frozen)

    def make_run(reps, dtype, precision):
        @jax.jit
        def run(img, lidar, radar, v):
            def rep(c, _):
                out = encode(
                    v, img + c * 1e-30, lidar, radar, dtype, precision
                )
                return c + sum(
                    jnp.sum(o.astype(jnp.float32)) for o in out
                ) * 1e-30, None

            c, _ = jax.lax.scan(rep, jnp.float32(0.0), None, length=reps)
            return c

        return run

    def timeit(run):
        args = (img, lidar, radar, variables)
        np.asarray(run(*args))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, dtype, precision in (
        ("f32-default", None, "default"),
        ("f32-highest", None, "highest"),
        ("bf16", jnp.bfloat16, "default"),
    ):
        ta = timeit(make_run(REPS_A, dtype, precision))
        tb = timeit(make_run(REPS_B, dtype, precision))
        per = (tb - ta) / (REPS_B - REPS_A)
        print(f"encode_frozen[{name}]: {per*1e3:.3f} ms / {M_PAD} dets "
              f"({M_PAD/per:.0f} dets/s)")

    ref = encode(variables, img, lidar, radar, None, "highest")
    for name, dtype, precision in (
        ("f32-default", None, "default"),
        ("bf16", jnp.bfloat16, "default"),
    ):
        out = encode(variables, img, lidar, radar, dtype, precision)
        for mod_name, a, b in zip(("img", "pn", "rn"), ref, out):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = np.abs(a).max()
            print(f"{name}/{mod_name}: max|Δ| {np.abs(a-b).max():.4g} "
                  f"(feature scale {scale:.3g})")


if __name__ == "__main__":
    main()
