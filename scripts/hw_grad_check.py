"""Direct fused-vs-XLA GRADIENT comparison on real TPU hardware at a
given bucket (default: the trainval training bucket (256, 4096)).

The CI gradient-equivalence gates run through the Pallas interpreter on
CPU; this probe compares the hand-written Pallas backward against XLA
autodiff on the actual hardware lowering, per parameter leaf. Expected:
relative error at the f32-reassociation level (~1e-3..1e-2 on the small
leaves); a leaf at O(1) relative error indicates a real kernel defect.

Run: python scripts/hw_grad_check.py [max_nodes max_edges]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN
from batch3dmot_tpu.ops.pallas_mp_train import fused_training_scores


def main():
    mn = int(sys.argv[1]) if len(sys.argv) > 2 else 256
    me = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    cfg = GraphConstructionConfig(top_knn_nodes=40)
    scene = make_synthetic_scene(
        seed=0, num_frames=40, num_tracks=40, with_modalities=True,
        modality_dropout=0.25,
    )
    windows = [
        w
        for w in build_scene_graphs(scene, 5, cfg)
        if 0 < w.num_edges <= me and w.num_nodes <= mn
    ]
    B = 8
    graphs = [
        pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, edge_label=w.edge_label,
            edge_weight=w.edge_weight, max_nodes=mn, max_edges=me,
            img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
            radar=scene.radar[w.det_index],
        )
        for w in (windows * B)[:B]
    ]
    batch = batch_graphs(graphs)
    model = MultimodalGNN()
    variables = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(lambda x: x[0], batch)
    )
    variables = dict(variables)
    params = variables.pop("params")

    def loss_from_scores(scores):
        # masked CB-style weighted BCE against the labels (same shape of
        # loss the trainer optimizes — enough to exercise every grad path)
        lab = batch.edge_label.astype(jnp.float32)
        w = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
        eps = 1e-7
        s = jnp.clip(scores, eps, 1 - eps)
        bce = -(lab * jnp.log(s) + (1 - lab) * jnp.log(1 - s))
        return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)

    # B3D_GRAD_CHECK_ENCODED=1 exercises the precomputed-encoding form —
    # the only form admitted at the 2M-product (512, 4096) bucket
    encoded = os.environ.get("B3D_GRAD_CHECK_ENCODED") == "1"
    enc = None
    if encoded:
        import jax.numpy as jnp2

        enc = (
            jnp2.zeros((B, mn, 96)), jnp2.zeros((B, mn, 256)),
            jnp2.zeros((B, mn, 256)), jnp2.ones((B, mn), bool),
            jnp2.ones((B, mn), bool),
        )

    def f_xla(p):
        vs = {"params": p, **variables}
        if encoded:
            scores = jax.vmap(
                lambda g, xi, pn, rn, lp, rp: model.apply(
                    vs, g, xi, pn, rn, lp, rp,
                    method=model.forward_from_encodings,
                )[0]
            )(batch, *enc)
        else:
            scores = jax.vmap(lambda g: model.apply(vs, g)[0])(batch)
        return loss_from_scores(scores)

    def f_fused(p):
        scores = fused_training_scores(
            model, variables, p, batch, encodings=enc
        )
        return loss_from_scores(scores)

    print(f"bucket ({mn},{me}) x{B}", flush=True)
    l_x, g_x = jax.jit(jax.value_and_grad(f_xla))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(f_fused))(params)
    print(f"loss: xla {float(l_x):.6f}  fused {float(l_f):.6f}", flush=True)

    flat_f = dict(
        (jax.tree_util.keystr(k), np.asarray(v))
        for k, v in jax.tree.leaves_with_path(g_f)
    )
    worst = []
    for k, v in jax.tree.leaves_with_path(g_x):
        name = jax.tree_util.keystr(k)
        a, b = flat_f[name], np.asarray(v)
        scale = max(np.abs(b).max(), 1e-8)
        rel = np.abs(a - b).max() / scale
        worst.append((rel, name, float(np.abs(b).max())))
    worst.sort(reverse=True)
    for rel, name, mag in worst[:12]:
        print(f"  rel {rel:9.2e}  |g_xla|max {mag:9.2e}  {name}", flush=True)
    bad = [w for w in worst if w[0] > 0.1]
    print(f"{'FAIL' if bad else 'OK'}: {len(bad)} leaves above 0.1 relative",
          flush=True)


if __name__ == "__main__":
    main()
