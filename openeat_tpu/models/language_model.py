"""Transformer language model: autoregressive or BERT-style masked.

Parity: reference openeat/models/language_model.py:30-125 — token
embedding -> positional encoding -> Encoder block stack (no conv) ->
output projection -> label-smoothing loss; `autoregressive=True` trains
causal next-token prediction (sos/eos framing), `False` trains masked-LM
over collate-produced masked inputs with targets only at masked
positions. Built to the intended behavior: the reference's undefined
hyperparameter names and missing import (language_model.py:53-64,
SURVEY.md §2.1) become explicit constructor fields.

`score_tokens` is the shallow-fusion hook used by attention rescoring
(reference recognize.py:163-175 + asr_model.py:490-500).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.embedding import PositionalEncoding
from openeat_tpu.modules.encoder import Encoder
from openeat_tpu.modules.label_smoothing import label_smoothing_loss
from openeat_tpu.utils.common import (IGNORE_ID, add_sos_eos, get_activation,
                                      th_accuracy)
from openeat_tpu.utils.mask import make_attn_mask


class LanguageModel(nn.Module):
    vocab_size: int
    d_model: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 6
    num_blocks_share: int = 1
    dropout_rate: float = 0.1
    positional_dropout_rate: float | None = 0.0  # reference PE: no dropout
    activation_type: str = "relu"
    autoregressive: bool = True
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    tie_word_embedding: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def apply(self, variables, *args, **kwargs):
        """flax apply accepting int8 weight-quantized variables — same
        hook as ASRModel.apply (utils/quantize.py)."""
        from openeat_tpu.utils.quantize import maybe_dequantize
        return nn.Module.apply(
            self, maybe_dequantize(variables, self.compute_dtype),
            *args, **kwargs)

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              dtype=self.compute_dtype)
        pos_drop = (self.dropout_rate if self.positional_dropout_rate is None
                    else self.positional_dropout_rate)
        self.pos_enc = PositionalEncoding(self.d_model, pos_drop)
        self.encoder = Encoder(
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            activation=get_activation(self.activation_type),
            macaron_style=False,
            use_cnn_module=False,
            num_blocks=self.num_blocks,
            num_blocks_share=self.num_blocks_share,
            dtype=self.compute_dtype,
        )
        if not self.tie_word_embedding:
            self.output_layer = nn.Dense(self.vocab_size,
                                         dtype=self.compute_dtype)

    def encode(self, tokens: jax.Array, lengths: jax.Array, *,
               causal: bool = True, deterministic: bool = True) -> jax.Array:
        """tokens [B, L] -> logits [B, L, V] (f32).

        The reference's `_forward_encoder` (language_model.py:109-125).
        """
        x = self.embed(tokens)
        x, _ = self.pos_enc(x, deterministic=deterministic)
        mask = make_attn_mask(lengths, tokens.shape[1],
                              causal=causal and self.autoregressive)
        pos_emb = jnp.zeros((1, tokens.shape[1], self.d_model), x.dtype)
        h = self.encoder(x, mask, pos_emb, deterministic=deterministic)
        if self.tie_word_embedding:
            logits = self.embed.attend(h.astype(self.embed.embedding.dtype))
        else:
            logits = self.output_layer(h)
        return logits.astype(jnp.float32)

    def __call__(self, tokens: jax.Array, lengths: jax.Array,
                 masked_targets: jax.Array | None = None, *,
                 deterministic: bool = True) -> dict[str, jax.Array]:
        """Training loss (reference language_model.py:90-107)."""
        if self.autoregressive:
            ys_in, ys_out = add_sos_eos(tokens, lengths, self.sos, self.eos)
            logits = self.encode(ys_in, lengths + 1, causal=True,
                                 deterministic=deterministic)
            targets = ys_out
        else:
            assert masked_targets is not None, "masked LM needs targets"
            inputs = jnp.where(tokens == IGNORE_ID, self.eos, tokens)
            logits = self.encode(inputs, lengths, causal=False,
                                 deterministic=deterministic)
            targets = masked_targets
        loss = label_smoothing_loss(logits, targets, self.lsm_weight,
                                    IGNORE_ID, self.length_normalized_loss)
        acc = th_accuracy(logits, targets, IGNORE_ID)
        return {"loss": loss, "acc": acc}

    def log_probs(self, tokens: jax.Array, lengths: jax.Array) -> jax.Array:
        """Log-softmax scores for shallow fusion: [B, L, V]."""
        return jax.nn.log_softmax(
            self.encode(tokens, lengths, causal=True), axis=-1)

    def mlm_log_probs(self, tokens: jax.Array,
                      lengths: jax.Array) -> jax.Array:
        """Non-causal (masked-LM) scores for pseudo-likelihood fusion."""
        return jax.nn.log_softmax(
            self.encode(tokens, lengths, causal=False), axis=-1)


def build_language_model(model_conf: dict, vocab_size: int) -> LanguageModel:
    mc = dict(model_conf)
    return LanguageModel(
        vocab_size=vocab_size,
        d_model=mc.get("d_model", 256),
        attention_heads=mc.get("attention_heads", 4),
        linear_units=mc.get("linear_units", 1024),
        num_blocks=mc.get("num_blocks", mc.get("encoder_num_blocks", 6)),
        num_blocks_share=mc.get("num_blocks_share",
                                mc.get("encoder_num_blocks_share", 1)),
        dropout_rate=mc.get("dropout_rate", 0.1),
        activation_type=mc.get("activation", "relu"),
        autoregressive=mc.get("autoregressive", True),
        lsm_weight=mc.get("lsm_weight", 0.1),
        length_normalized_loss=mc.get("length_normalized_loss", False),
        tie_word_embedding=mc.get("tie_word_embedding", False),
        compute_dtype=jnp.dtype(mc.get("compute_dtype", "bfloat16")),
    )
