"""Prototype-model explanation hooks (ProtoMF family).

Parity target: `/root/reference/explanations/utils.py:19-300`
(`protomf_post_val_light` / `protomfs_post_val`): after validation, compute
prototype diagnostics — entity↔prototype similarity statistics, prototype
utilization, and a 2-D t-SNE of prototypes + a sample of entity embeddings —
returned as a dict suitable for metric logging (figures as file paths instead
of wandb.Image so the hook works offline).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def prototype_statistics(prototypes: np.ndarray, entity_embeddings: np.ndarray,
                         sim_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                         prefix: str = "") -> dict:
    """Similarity summary stats between entities and prototypes
    (the numeric part of the reference's post_val hooks)."""
    sim = np.asarray(sim_fn(entity_embeddings, prototypes))  # [n, P]
    best = sim.argmax(axis=1)
    util = np.bincount(best, minlength=prototypes.shape[0]) / len(best)
    key = (lambda s: f"{prefix}{s}") if prefix else (lambda s: s)
    return {
        key("proto_sim_mean"): float(sim.mean()),
        key("proto_sim_max_mean"): float(sim.max(axis=1).mean()),
        key("proto_sim_min_mean"): float(sim.min(axis=1).mean()),
        key("proto_utilization_entropy"): float(
            -(util[util > 0] * np.log(util[util > 0])).sum()),
        key("proto_dead_fraction"): float((util == 0).mean()),
    }


def tsne_prototype_plot(prototypes: np.ndarray, entity_embeddings: np.ndarray,
                        out_path: str, entity_name: str = "Entities",
                        max_entities: int = 2000, seed: int = 0
                        ) -> Optional[str]:
    """2-D t-SNE of prototypes (+sampled entities) saved as a PNG; returns the
    path, or None when sklearn/matplotlib are unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE
    except ImportError:
        return None

    rng = np.random.default_rng(seed)
    ents = entity_embeddings
    if len(ents) > max_entities:
        ents = ents[rng.choice(len(ents), max_entities, replace=False)]
    joint = np.concatenate([prototypes, ents], axis=0)
    perplexity = min(30.0, max(2.0, (len(joint) - 1) / 3))
    coords = TSNE(n_components=2, random_state=seed,
                  perplexity=perplexity).fit_transform(joint)
    n_proto = len(prototypes)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(coords[n_proto:, 0], coords[n_proto:, 1], s=4, alpha=0.3,
               label=entity_name)
    ax.scatter(coords[:n_proto, 0], coords[:n_proto, 1], s=40, marker="*",
               label="Prototypes")
    ax.legend()
    ax.set_title(f"{entity_name} vs prototypes (t-SNE)")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def protomf_post_val(params: dict, entity: str, epoch: int,
                     results_dir: Optional[str] = None) -> dict:
    """post_val hook for a fitted ProtoMF-family model: reads prototypes and
    the entity embedding table from the params pytree (reference
    `post_val`, sgd_alg.py:426-429, 530-537)."""
    from sibrar_tpu.models.protomf import shifted_cosine_sim

    protos = None
    for key in ("prototypes", "u_prototypes" if entity == "user" else "i_prototypes"):
        if key in params:
            protos = np.asarray(params[key])
            break
    emb_key = "user_embed" if entity == "user" else "item_embed"
    if protos is None or emb_key not in params:
        return {}
    table = np.asarray(params[emb_key]["embedding"])
    if table.shape[-1] != protos.shape[-1]:
        return {}  # this side holds per-prototype weights, not embeddings
    out = prototype_statistics(
        protos, table, lambda a, b: np.asarray(shifted_cosine_sim(a, b)),
        prefix=f"{entity}_")
    if results_dir:
        png = tsne_prototype_plot(
            protos, table, os.path.join(results_dir, f"tsne_{entity}_{epoch}.png"),
            entity_name=entity.capitalize() + "s")
        if png:
            out[f"{entity}_tsne_plot"] = png
    return out
