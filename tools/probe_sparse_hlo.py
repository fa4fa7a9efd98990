"""Dump the optimized HLO around the row-adam scatters of the sparse MF
epoch, to identify why XLA inserts full-table copy fusions before some of
the six row scatters (param/mu/nu x two tables) but not others.

One compile (cached); prints scatter/copy/fusion lines referencing
[n, d]-shaped buffers inside the while body.

Usage: python tools/probe_sparse_hlo.py [n_rows] [batch] [d]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    steps = 20
    n_inter = steps * bs + bs
    pairs = np.unique(np.stack([rng.integers(0, n, n_inter),
                                rng.integers(0, n, n_inter)], axis=1), axis=0)
    train = RecDataset(split_set="train", n_users=n, n_items=n,
                       interactions=pairs.astype(np.int64),
                       train_interactions=pairs.astype(np.int64))
    device_data = train.to_device()
    model = SGDMatrixFactorization(n_users=n, n_items=n, embedding_dim=d)
    learn = LearningConfig(n_epochs=1, lr=1e-3, rec_loss="bpr",
                           max_batches_per_epoch=steps,
                           optimizing_metric="ndcg@10", sparse_tables=True)
    evaluator = FullEvaluator(EvalConfig(top_k=[10]), train,
                              device_data=device_data)
    trainer = Trainer(model, train, evaluator, learn,
                      DatasetConfig(n_negative_samples=10),
                      batch_size=bs, seed=0, device_data=device_data,
                      init_for_training=False)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(scale=0.05, size=x.shape).astype(x.dtype))
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            trainer.state.params),
        opt_state=trainer.init_opt_state(trainer.state.params))

    n_batches, tail = trainer.epoch_batch_plan(
        int(trainer.data.train_users.shape[0]), bs,
        learn.max_batches_per_epoch)
    epoch = trainer._make_epoch_fn(n_batches, tail)
    perm = jnp.arange(n_batches * bs + tail, dtype=jnp.int32)
    print("lowering + compiling...", flush=True)
    compiled = jax.jit(lambda s, p: epoch(s, p)).lower(
        trainer.state, perm).compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt)} chars", flush=True)
    shape = re.escape(f"f32[{n},{d}]")
    keep = re.compile(
        rf"({shape}.*(scatter|copy|fusion))|((scatter|copy\b).*{shape})")
    for line in txt.splitlines():
        ls = line.strip()
        if re.search(shape, ls) and re.search(
                r"%(scatter|copy|fusion|add|dynamic-update)", ls):
            print(ls[:240])


if __name__ == "__main__":
    main()
