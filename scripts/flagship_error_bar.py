"""Pin the flagship's AMOTA error bar (VERDICT r4 next #2).

The flagship headline (scripts/flagship_synthetic.py, 80 epochs) has rested
on THREE held-out scenes and moved ~0.02 with compiled-program identity —
20x the 0.1% parity budget in BASELINE.md, with no way to tell eval-set
variance from training sensitivity. This driver separates the two axes:

  1. N training seeds (init + shuffle; identical scenes) x 80 epochs, each
     scored on a WIDENED 30-scene held-out set -> mean +- std over seeds at
     fixed eval set ("training sensitivity");
  2. ONE checkpoint (seed 0) re-scored on the original 3-scene set vs the
     30-scene set -> the eval-set-size axis ("metric variance") with
     training held fixed.

Each run is its own process (fresh XLA client, shared persistent compile
cache), so program identity is as deterministic as the relay allows.

Run (real chip; ~5 x 3-4 min + 2 rescores):
    python scripts/flagship_error_bar.py [--seeds 5] [--epochs 80]
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def run_flagship(extra, log_path):
    cmd = [sys.executable, os.path.join(HERE, "flagship_synthetic.py"), *extra]
    print(f"$ {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    with open(log_path, "w") as f:
        f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"flagship run failed, log: {log_path}\n"
                           f"{proc.stderr[-2000:]}")
    m = re.search(r"^FLAGSHIP (\{.*\})$", proc.stdout, re.M)
    assert m, f"no FLAGSHIP summary line in {log_path}"
    return json.loads(m.group(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--val-scenes", type=int, default=30)
    ap.add_argument("--workdir", default="/tmp/b3d_flagship_sweep")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    base = ["--epochs", str(args.epochs)]
    runs = []
    for seed in range(args.seeds):
        ckpt = os.path.join(args.workdir, f"seed{seed}.msgpack")
        summary = run_flagship(
            base + [
                "--train-seed", str(seed),
                "--val-scenes", str(args.val_scenes),
                "--save-checkpoint", ckpt,
            ],
            os.path.join(args.workdir, f"seed{seed}.log"),
        )
        print(f"seed {seed}: AMOTA {summary['amota']:.4f} "
              f"(trainAP {summary['final_train_ap']:.4f})", flush=True)
        runs.append(summary)

    # eval-set-size axis: ONE checkpoint, two held-out set sizes
    ckpt0 = os.path.join(args.workdir, "seed0.msgpack")
    rescore = {}
    for n_val in (3, args.val_scenes):
        s = run_flagship(
            base + [
                "--load-checkpoint", ckpt0,
                "--val-scenes", str(n_val),
            ],
            os.path.join(args.workdir, f"rescore_val{n_val}.log"),
        )
        rescore[n_val] = s["amota"]
        print(f"seed-0 checkpoint on {n_val} held-out scenes: "
              f"AMOTA {s['amota']:.4f}", flush=True)

    amotas = np.array([r["amota"] for r in runs])
    amotps = np.array([r["amotp"] for r in runs])
    out = {
        "seeds": args.seeds,
        "epochs": args.epochs,
        "val_scenes": args.val_scenes,
        "amota_per_seed": [round(float(a), 4) for a in amotas],
        "amota_mean": round(float(amotas.mean()), 4),
        "amota_std": round(float(amotas.std(ddof=1)), 4),
        "amotp_mean": round(float(amotps.mean()), 4),
        "amotp_std": round(float(amotps.std(ddof=1)), 4),
        "rescore_seed0": {str(k): round(float(v), 4) for k, v in rescore.items()},
    }
    from batch3dmot_tpu.eval.tracking_metrics import json_safe

    out = json_safe(out)
    with open(os.path.join(args.workdir, "sweep_summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("SWEEP SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
