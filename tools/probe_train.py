"""TPU probe: SBNet train-step cost by ablation (bench-scale shapes).

Usage: python tools/probe_train.py {full|noreg|nointer|novec|idonly|neg1}
One jitted epoch program per process (tunnel compile budget).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def main():
    variant = sys.argv[1]
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    import bench

    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.sbnet import SingleBranchNet
    from sibrar_tpu.train.trainer import Trainer

    train = bench._bench_train_dataset()
    device_data = train.to_device()

    feats = [
        {"feature_name": "audio", "feature_hidden_layers": [512]},
        {"feature_name": "text", "feature_hidden_layers": [512]},
        {"feature_name": "genres"},
        {"feature_name": "interactions", "feature_hidden_layers": [512]},
        {"feature_name": "item_embedding"},
    ]
    reg = {"embedding_regularization_type": "pairwise_single",
           "regularization_weight": 0.5, "regularization_temperature": 0.2}
    n_neg = bench.TR_NEG
    if variant == "noreg":
        reg = {"embedding_regularization_type": "no_regularization"}
    elif variant == "nointer":
        feats = [f for f in feats if f["feature_name"] != "interactions"]
    elif variant == "novec":
        feats = [f for f in feats
                 if f["feature_name"] in ("genres", "item_embedding")]
    elif variant == "idonly":
        feats = [{"feature_name": "item_embedding"}]
        reg = {"embedding_regularization_type": "no_regularization"}
    elif variant == "neg1":
        n_neg = 1
    elif variant == "bag":
        from sibrar_tpu.models import layers

        layers.BAG_BREAK_EVEN_FACTOR = 0  # force the embedding-bag path
    elif variant == "spmm":
        from sibrar_tpu.models import layers

        layers.INTERACTION_SPMM = True  # fused sparse-input matmul path
    elif variant == "cmprows":
        # negative sampling via csr_contains_rows (segment gather + compare)
        from sibrar_tpu.data import sampling
        from sibrar_tpu.ops.sparse import csr_contains_rows

        def patched(csr, rows, cols):
            return csr_contains_rows(csr, rows[:, 0], cols)

        sampling.csr_contains = patched
    elif variant == "flatscatter":
        import jax.numpy as jnp

        from sibrar_tpu.ops import sparse

        def flat_densify(csr, rows, dtype=None):
            cols, mask = sparse.csr_row_gather(csr, rows)
            bshape = cols.shape[:-1]
            fc = cols.reshape(-1, cols.shape[-1])
            fm = mask.reshape(-1, mask.shape[-1])
            nb = fc.shape[0]
            flat_idx = (jnp.arange(nb, dtype=jnp.int32)[:, None] * csr.n_cols
                        + fc).reshape(-1)
            vals = fm.astype(jnp.float32).reshape(-1)
            out = jnp.zeros((nb * csr.n_cols,), jnp.float32)
            out = out.at[flat_idx].max(vals, unique_indices=False,
                                       indices_are_sorted=False, mode="drop")
            return out.reshape(*bshape, csr.n_cols)

        sparse.csr_rows_to_dense = flat_densify
    elif variant == "cmpdense":
        import jax.numpy as jnp

        from sibrar_tpu.ops import sparse

        def cmp_densify(csr, rows, dtype=None):
            # compare-broadcast densify: [.., L, n_cols] any-reduce
            cols, mask = sparse.csr_row_gather(csr, rows)
            iota = jnp.arange(csr.n_cols, dtype=jnp.int32)
            hit = (cols[..., None] == iota) & mask[..., None]
            return hit.any(axis=-2).astype(jnp.float32)

        sparse.csr_rows_to_dense = cmp_densify

    conf = {
        "shared_common_dim": 256,
        "user": {"feature_name": "user_embedding", "embedding_dim": 256},
        "item": {"features": feats,
                 "single_branch_hidden_layers": bench.SB_HIDDEN,
                 "common_modality_dim": bench.SB_COMMON, **reg},
    }
    model = SingleBranchNet.build_from_conf(conf, train, device_data)
    learn = LearningConfig(n_epochs=1, lr=1e-3, rec_loss="bpr",
                           max_batches_per_epoch=bench.TR_STEPS,
                           optimizing_metric="ndcg@10")
    evaluator = FullEvaluator(EvalConfig(top_k=[10]), train,
                              device_data=device_data)
    trainer = Trainer(model, train, evaluator, learn,
                      DatasetConfig(n_negative_samples=n_neg),
                      batch_size=bench.TR_BATCH, seed=0,
                      device_data=device_data, init_for_training=False)
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(scale=0.05, size=x.shape).astype(x.dtype))
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            trainer.state.params),
        opt_state=trainer.optimizer.init(trainer.state.params))

    trainer.train_epoch()  # compile + warm
    t0 = time.perf_counter()
    m = trainer.train_epoch()
    jax.block_until_ready(trainer.state.params)
    dt = (time.perf_counter() - t0) / bench.TR_STEPS
    print(json.dumps({"variant": variant, "ms_per_step": round(dt * 1e3, 3),
                      "steps_per_s": round(1 / dt, 2),
                      "loss_finite": bool(np.isfinite(m["train/loss"]))}))


if __name__ == "__main__":
    main()
