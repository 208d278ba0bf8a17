"""espresso_tpu: a TPU-native (JAX/XLA/Pallas/pjit) end-to-end speech
recognition framework with the capability surface of Espresso
(https://github.com/freewym/espresso), re-designed TPU-first.

Layer map (mirrors reference SURVEY.md section 1, rebuilt idiomatically):

- ``espresso_tpu.config``    : typed dataclass config tree + YAML + CLI overrides
  (replaces fairseq/dataclass + hydra, reference configs.py:1194)
- ``espresso_tpu.data``      : host-side data pipeline — manifests, Kaldi scp/ark IO,
  dictionaries, bucketed fixed-shape batching, checkpointable iterators
- ``espresso_tpu.features``  : fbank/MFCC front-end (Kaldi-compatible), CMVN,
  SpecAugment — jnp reference path + fused Pallas kernel
- ``espresso_tpu.ops``       : losses (label-smoothed CE, CTC, RNNT) and core array
  ops (masking, edit distance) as jittable functions / Pallas kernels
- ``espresso_tpu.modules``   : flax building blocks (attention, conformer pieces)
- ``espresso_tpu.models``    : LSTM / Transformer / Conformer enc-dec, Transducer,
  TDNN, LSTM-LM, look-ahead word-LM fusion
- ``espresso_tpu.decode``    : batched on-device decoders (greedy/CTC/transducer/
  beam search with LM fusion)
- ``espresso_tpu.parallel``  : mesh construction + sharding rules (dp/fsdp/tp)
- ``espresso_tpu.train``     : trainer (pjit train step, grad-accum, clipping),
  checkpointing (orbax), LR schedulers, metrics
- ``espresso_tpu.cli``       : espresso-compatible entry points (train,
  speech_recognize, dump_posteriors)
"""

__version__ = "0.1.0"
