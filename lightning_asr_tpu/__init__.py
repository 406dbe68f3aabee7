"""lightning_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CTC ASR framework.

Re-designed from scratch with the capabilities of the reference project
``kouyt5/lightning-asr`` (a PyTorch/pytorch-lightning QuartzNet CTC trainer):
mel-spectrogram frontend on device, QuartzNet-style separable-conv encoders
with a BiLSTM context branch, CTC training with NovoGrad + cosine warmup
restarts, WER/CER metrics, greedy + LM-fused beam-search decoding, SSL
feature path with pseudo-labeling, an inference API and an HTTP server.

Layering (bottom → top):
  ops/       device kernels: mel frontend, CTC loss, LSTM scan, masking
  data/      manifests, vocab, wav decode, bucketing pipeline, augmentation
  models/    the QuartzNet model zoo (flax linen)
  optim/     NovoGrad, LR schedules (cosine warmup restarts, policy zoo)
  metrics/   WER/CER
  decoding/  greedy + beam-search (C++ native with n-gram LM)
  parallel/  mesh + sharding helpers (pjit data parallelism over ICI)
  training/  Trainer, checkpoints (orbax), loggers, callbacks, profiler
  inference/ AsrTranslator-style offline API + HTTP server
  ssl_codec/ wav2vec2 feature path, confidence scoring, pseudo-labels
"""

__version__ = "0.1.0"
