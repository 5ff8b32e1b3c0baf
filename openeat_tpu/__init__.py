"""OpenEAT-TPU: a TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of OpenEAT
(reference: TongtongSong/OpenEAT): hybrid CTC/attention ASR with
Conformer/Transformer encoders, Transformer (bi-)decoders, four decoding
modes, Transformer-LM shallow fusion, adapter fine-tuning, and a
kaldi-compatible data pipeline — all built TPU-first:

- the feature frontend (framing / dither / preemphasis / povey window /
  rFFT / mel / log + SpecAugment) is a single jitted device function;
- models are flax.linen modules compiled by XLA, bf16 on the MXU;
- the training step is one jitted SPMD program over a jax.sharding.Mesh
  (data/model axes), gradient reduction via XLA collectives on ICI;
- decoding (CTC greedy / prefix beam search / attention beam search /
  attention rescoring) runs batched on-device with lax control flow.
"""

__version__ = "0.1.0"

IGNORE_ID = -1
