"""ance_tpu — a TPU-native dense-retrieval engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of microsoft/ANCE
(Approximate Nearest Neighbor Negative Contrastive Estimation, arXiv:2007.00808):
a dual-encoder dense retriever whose hard negatives are mined from an exact
inner-product index over the full corpus, refreshed from the live training
checkpoint.

Architecture (TPU-first, not a port):
  - ``core``       mesh setup, sharding specs, precision policy
  - ``models``     flax dual encoders (RoBERTa/BERT/SEED), losses, HF weight import
  - ``ops``        Pallas kernels: flash attention, fused matmul+top-k
  - ``index``      sharded HBM-resident exact inner-product index
  - ``optim``      LAMB port (reference utils/lamb.py semantics), schedules
  - ``data``       fixed-record binary token caches, preprocessing, streaming feed
  - ``train``      train step, warmup trainer, ANN generation, async/pipelined loop
  - ``evaluation`` MRR/NDCG/recall/coverage metrics (official-script parity)
"""

__version__ = "0.1.0"
