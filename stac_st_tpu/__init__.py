"""stac_st_tpu — a TPU-native speech-translation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
amazon-science/stac-speech-translation (STAC-ST, EMNLP 2023): joint
ASR + speech-translation with language-token prompting and speaker-turn
tokens, re-architected for TPU (SPMD over device meshes, static bucketed
shapes, MXU-friendly kernels, KV-cached batched beam search).

Layer map (mirrors SURVEY.md §1 of the rebuild survey):
  config/    — hyperpyyaml-compatible composition root + CLI overrides
  tokenizer/ — SentencePiece-compatible BPE (train/encode/decode, .model IO)
  data/      — JSON manifests, duration-bucketed static batching, audio IO
  ops/       — device ops: fbank (DFT-matmul), CMVN, SpecAugment, losses
  models/    — conv frontend + pre-LN transformer encoder/decoder
  decoding/  — prompted batched beam search with KV cache
  training/  — train step (pjit/shard_map), schedulers, checkpointing
  parallel/  — mesh construction and sharding rules
  utils/     — metrics (BLEU/WER/ACC), RTTM, logging
"""

__version__ = "0.1.0"
