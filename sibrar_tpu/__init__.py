"""sibrar_tpu — a TPU-native (JAX/XLA/pjit/Pallas) multi-modal recommender framework.

A ground-up rebuild of the capabilities of the SiBraR reference framework
(Tigxy/SiBraR---Single-Branch-Recommender, RecSys 2024): implicit-feedback top-K
recommendation with a model zoo (MF, DeepMF, CLCRec-style feature MF, DropoutNet,
the single-branch multi-modal SiBraR/SBNet, ProtoMF family, ECF, KNN/linear/graph/
naive baselines), YAML-inherited configs, offline preprocessing with random/temporal/
cold-start splits, BPR/BCE/sampled-softmax losses with on-device negative sampling,
InfoNCE cross-modal regularization, and sharded full-catalog ranked evaluation.

Unlike the single-device eager PyTorch reference, everything here is built TPU-first:
one jitted train step with on-device sampling, device-resident feature tables, and
mesh-sharded full-catalog scoring with fused top-k.
"""

__version__ = "0.1.0"
