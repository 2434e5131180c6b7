"""Warm multi-scene CLI `predict` wall time, grouped vs per-scene dispatch.

The round-2 relay work took the warm 12-scene encoded CLI predict
68.5 s -> 7.6 s (run-global program shapes + two-stage pipeline,
docs/RESULTS.md). Round 3 added cross-scene GROUPED encoded scoring
(`SceneEncodedScorer.score_scenes`: one encode + one scanned scoring
dispatch per scene group, `predict.scenes_per_batch`); this harness
measures the same 12-scene workload through the real CLI with grouping
on vs off. Pass 1 pays compiles; pass 2 is the steady state reported in
docs/RESULTS.md.

Weights are randomly initialized (no --checkpoint): this harness measures
dispatch/compile/fetch wall time only — scores are meaningless and that is
fine, program shapes and costs are checkpoint-independent (weights are jit
arguments).

Run (real chip): python scripts/bench_cli_predict.py [n_scenes]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from batch3dmot_tpu.cli import main


def run():
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    # B3D_BENCH_TRAINVAL_SCALE=1: reference production density (40 frames x
    # 40 tracks, predict L=2, kNN 16 — the round-4 record config) and ONLY
    # the cached-embedding A/B (VERDICT r4 next #3): raw grouped encode vs
    # cold cache-write vs warm cache re-run.
    trainval = bool(os.environ.get("B3D_BENCH_TRAINVAL_SCALE"))
    tmp = tempfile.mkdtemp(prefix="b3d_cli_bench_")
    common = ["--set", f"paths.tmp={tmp}"]
    if trainval:
        common += [
            "--set", "graph_construction.synthetic_frames=40",
            "--set", "graph_construction.synthetic_tracks=40",
            "--set", "graph_construction.batch_size_graph=2",
            "--set", "graph_construction.top_knn_nodes=16",
        ]
    results = {}

    def timed(label, pass_no, extra):
        eval_dir = os.path.join(tmp, f"eval_{label}_{pass_no}")
        t0 = time.time()
        main([
            "predict", "--model", "mm", "--pipeline", "encoded",
            *common,
            "--set", f"paths.eval={eval_dir}",
            *extra,
        ])
        dt = time.time() - t0
        print(
            f"predict[encoded] {label} pass{pass_no}: {dt:.2f}s "
            f"({n_scenes / dt:.2f} scenes/s)",
            flush=True,
        )
        results[(label, pass_no)] = dt

    try:
        t0 = time.time()
        main(["build-graphs", "--synthetic", str(n_scenes), *common])
        print(f"build-graphs: {time.time() - t0:.1f}s", flush=True)

        if not trainval:
            for label, spb in (
                ("per-scene", 1), ("grouped4", 4), ("grouped6", 6)
            ):
                for pass_no in (1, 2):
                    timed(label, pass_no, [
                        "--set", f"predict.scenes_per_batch={spb}",
                        "--set", "predict.embedding_cache=off",
                    ])

        # cached-embedding A/B at the best grouping for the density
        spb = ["--set", f"predict.scenes_per_batch={2 if trainval else 4}"]
        for label, extra in (
            ("raw-off", ["--set", "predict.embedding_cache=off"]),
            ("cache-write-cold", ["--set", "predict.embedding_cache=write"]),
            ("cache-auto-warm", []),
        ):
            for pass_no in (1, 2):
                timed(label, pass_no, spb + extra)

        # B3D_BENCH_SPB="2,4,6": group-size sweep of the WARM cached path —
        # cached embeddings cut per-scene upload ~3.6x, so the group size
        # that balanced upload overlap against dispatch count for the raw
        # path (2 at trainval density) may no longer be optimal
        for g in filter(None, os.environ.get("B3D_BENCH_SPB", "").split(",")):
            for pass_no in (1, 2):
                timed(f"cache-warm-spb{g}", pass_no, [
                    "--set", f"predict.scenes_per_batch={int(g)}",
                ])
        if (("raw-off", 2) in results and ("cache-auto-warm", 2) in results):
            print(
                f"warm-cache speedup vs raw (pass2): "
                f"{results[('raw-off', 2)] / results[('cache-auto-warm', 2)]:.2f}x",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return results


if __name__ == "__main__":
    run()
