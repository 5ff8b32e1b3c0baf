"""Hybrid CTC/attention ASR model (flax.linen).

Parity: reference openeat/models/asr_model.py:35-203 — GlobalCMVN +
Transformer/Conformer encoder + CTC head + (bi)Transformer decoder +
label-smoothing loss; joint loss `ctc_weight * ctc + (1-ctc_weight) *
att` with optional right-to-left decoder loss at `reverse_weight`
(asr_model.py:126-203); sos = eos = vocab_size - 1.

Decoding lives in openeat_tpu.decode as batched on-device programs; this
module exposes the pure functions they need (`encode`,
`ctc_log_probs`, `decoder_logits`, `loss`) via flax apply methods.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.ctc import CTCHead
from openeat_tpu.modules.decoder import BiTransformerDecoder
from openeat_tpu.modules.encoder import TransformerEncoder
from openeat_tpu.modules.label_smoothing import label_smoothing_loss
from openeat_tpu.utils.common import (IGNORE_ID, add_sos_eos, get_activation,
                                      reverse_pad_list, th_accuracy)
from openeat_tpu.utils.mask import make_attn_mask, make_non_pad_mask


class ASRModel(nn.Module):
    input_size: int = 80
    vocab_size: int = 4233
    encoder_num_blocks: int = 12
    encoder_num_blocks_share: int = 1
    decoder_num_blocks: int = 3
    r_decoder_num_blocks: int = 0
    decoder_num_blocks_share: int = 1
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    d_model: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    dropout_rate: float = 0.1
    # the reference applies NO dropout inside its positional encodings
    # (embedding.py:44-88 has no dropout member); 0.0 matches that, the
    # knob exists for experiments
    positional_dropout_rate: float | None = 0.0
    activation_type: str = "swish"
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    encoder_use_adapter: bool = False
    decoder_use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    # encoder mixture-of-experts FFN (beyond-reference, SURVEY.md §2.7
    # lists EP as absent upstream): >0 replaces the main encoder FFN
    # with a top-k routed expert bank whose expert axis shards over the
    # mesh 'model' axis. The Switch load-balance aux loss is sown as
    # 'intermediates'/'moe_aux_loss' and added to the training loss at
    # moe_aux_weight by parallel/train_step.make_loss_fn.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    reverse_weight: float = 0.0
    length_normalized_loss: bool = False
    use_global_cmvn: bool = False
    tie_word_embedding: bool = False
    remat: bool = False
    ctc_impl: str = "optax"  # 'optax' | 'native' (Pallas kernel)
    static_chunk_size: int = 0   # >0: streaming-style chunked attention
    num_left_chunks: int = -1
    use_dynamic_chunk: bool = False  # random chunk sizes during training
    sequence_sharding: bool = False  # SP: time axis over the 'model' axis
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def apply(self, variables, *args, **kwargs):
        """flax apply, additionally accepting int8 weight-quantized
        variables (utils/quantize.py QTensor leaves are widened here,
        inside the caller's jit, so every decode entry point serves
        quantized checkpoints unchanged)."""
        from openeat_tpu.utils.quantize import maybe_dequantize
        return nn.Module.apply(
            self, maybe_dequantize(variables, self.compute_dtype),
            *args, **kwargs)

    def setup(self):
        act = get_activation(self.activation_type)
        pos_drop = (self.dropout_rate if self.positional_dropout_rate is None
                    else self.positional_dropout_rate)
        self.encoder = TransformerEncoder(
            input_size=self.input_size,
            input_layer=self.input_layer,
            pos_enc_layer_type=self.pos_enc_layer_type,
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=pos_drop,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            activation=act,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            causal=self.causal,
            use_adapter=self.encoder_use_adapter,
            down_size=self.down_size,
            scalar=self.scalar,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            num_blocks=self.encoder_num_blocks,
            num_blocks_share=self.encoder_num_blocks_share,
            use_global_cmvn=self.use_global_cmvn,
            static_chunk_size=self.static_chunk_size,
            num_left_chunks=self.num_left_chunks,
            use_dynamic_chunk=self.use_dynamic_chunk,
            sequence_sharding=self.sequence_sharding,
            remat=self.remat,
            dtype=self.compute_dtype,
        )
        self.ctc = CTCHead(self.vocab_size, self.length_normalized_loss,
                           impl=self.ctc_impl, dtype=self.compute_dtype)
        self.decoder = BiTransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=pos_drop,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            activation=act,
            use_adapter=self.decoder_use_adapter,
            down_size=self.down_size,
            scalar=self.scalar,
            num_blocks=self.decoder_num_blocks,
            r_num_blocks=self.r_decoder_num_blocks,
            num_blocks_share=self.decoder_num_blocks_share,
            share_embedding=self.tie_word_embedding,
            dtype=self.compute_dtype,
        )

    # ---- training ----

    def __call__(self, features, features_length, targets, targets_length,
                 *, deterministic: bool = True) -> dict[str, jax.Array]:
        """Joint loss (reference asr_model.py:126-157). Returns metrics."""
        encoder_out, out_lens, _ = self.encoder(
            features, features_length, deterministic=deterministic)
        return self._joint_loss(encoder_out, out_lens, targets,
                                targets_length, deterministic=deterministic)

    def _joint_loss(self, encoder_out, out_lens, targets, targets_length,
                    *, deterministic: bool = True) -> dict[str, jax.Array]:
        loss_ctc = self.ctc.loss(encoder_out, out_lens, targets,
                                 targets_length)
        metrics = {"loss_ctc": loss_ctc}
        if self.ctc_weight < 1.0:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, out_lens, targets, targets_length,
                deterministic=deterministic)
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
            metrics.update(loss_att=loss_att, acc=acc_att)
        else:
            loss = loss_ctc
            metrics["acc"] = jnp.zeros(())
        metrics["loss"] = loss
        return metrics

    def _calc_att_loss(self, encoder_out, encoder_out_lens, ys_pad,
                       ys_pad_lens, *, deterministic: bool = True):
        """Attention loss (+reverse) — reference asr_model.py:159-203."""
        ys_in, ys_out = add_sos_eos(ys_pad, ys_pad_lens, self.sos, self.eos)
        ys_in_lens = ys_pad_lens + 1
        l_in = ys_in.shape[1]
        tgt_mask = make_attn_mask(ys_in_lens, l_in, causal=True)
        memory_mask = make_non_pad_mask(
            encoder_out_lens, encoder_out.shape[1])[:, None, :]
        if self.reverse_weight > 0:
            r_ys = reverse_pad_list(ys_pad, ys_pad_lens, IGNORE_ID)
            r_ys_in, r_ys_out = add_sos_eos(r_ys, ys_pad_lens, self.sos,
                                            self.eos)
        else:
            r_ys_in = jnp.zeros_like(ys_in)
            r_ys_out = None
        decoder_out, r_decoder_out, _ = self.decoder(
            encoder_out, memory_mask, ys_in, r_ys_in, tgt_mask,
            deterministic=deterministic)
        loss_att = label_smoothing_loss(
            decoder_out, ys_out, self.lsm_weight, IGNORE_ID,
            self.length_normalized_loss)
        if self.reverse_weight > 0:
            r_loss = label_smoothing_loss(
                r_decoder_out, r_ys_out, self.lsm_weight, IGNORE_ID,
                self.length_normalized_loss)
            loss_att = (1 - self.reverse_weight) * loss_att \
                + self.reverse_weight * r_loss
        acc = th_accuracy(decoder_out, ys_out, IGNORE_ID)
        return loss_att, acc

    # ---- pipeline-parallel split points (parallel/pipeline.py) ----

    def pipeline_head(self, features, features_length, *,
                      deterministic: bool = True):
        """Frontend half of the encoder (CMVN + subsampling embed) for
        the pipeline-parallel path, which runs the block stack itself
        as a GPipe schedule. Returns (xs [B,T',D], pos_emb, out_lens).
        The reference has no PP (SURVEY.md §2.7)."""
        enc = self.encoder
        xs = features
        if enc.use_global_cmvn:
            xs = enc.global_cmvn(xs)
        xs = xs.astype(enc.dtype)
        xs, pos_emb, out_lens = enc.embed(xs, features_length,
                                          deterministic=deterministic)
        return xs, pos_emb, out_lens

    def pipeline_tail(self, xs, out_lens, targets, targets_length, *,
                      deterministic: bool = True):
        """Loss half for the PP path: encoder after_norm + joint loss."""
        encoder_out = self.encoder.encoders.after_norm(xs)
        return self._joint_loss(encoder_out, out_lens, targets,
                                targets_length,
                                deterministic=deterministic)

    # ---- decode-support methods (use via apply(..., method=...)) ----

    def encode(self, features, features_length):
        """(encoder_out [B,T,D] f32, out_lens [B])."""
        encoder_out, out_lens, _ = self.encoder(
            features, features_length, deterministic=True)
        return encoder_out.astype(jnp.float32), out_lens

    def ctc_log_probs(self, encoder_out):
        return self.ctc.log_softmax(encoder_out.astype(self.compute_dtype))

    def encode_chunk(self, feat_window, offset, k_caches, v_caches,
                     cache_len, cnn_caches, valid_len=None):
        """Streaming encoder step (see TransformerEncoder.forward_chunk).
        valid_len masks the chunk tail on the final (padded) chunk."""
        out, k, v, c = self.encoder.forward_chunk(
            feat_window, offset, k_caches, v_caches, cache_len, cnn_caches,
            valid_len)
        return out.astype(jnp.float32), k, v, c

    def decoder_init_cache(self, encoder_out, beam_batch: int,
                           max_len: int):
        """KV-cache for incremental left-decoder stepping (decode)."""
        memory = encoder_out.astype(self.compute_dtype)
        return self.decoder.init_cache(memory, beam_batch, max_len)

    def decoder_step(self, tokens, pos, cache, encoder_out_lens,
                     encoder_t: int):
        """One-step decoder scores: ([B, V] f32 log-probs, new cache)."""
        memory_mask = make_non_pad_mask(encoder_out_lens,
                                        encoder_t)[:, None, :]
        return self.decoder.forward_step(tokens, pos, cache, memory_mask)

    def decoder_logits(self, encoder_out, encoder_out_lens, ys_in,
                       ys_in_lens, reverse: bool = False):
        """Full forward of the (left or right) decoder on token prefixes.

        ys_in: [B, L] already sos-prefixed tokens. Returns log-softmax
        normalized scores [B, L, V] f32.
        """
        l_in = ys_in.shape[1]
        tgt_mask = make_attn_mask(ys_in_lens, l_in, causal=True)
        memory_mask = make_non_pad_mask(
            encoder_out_lens, encoder_out.shape[1])[:, None, :]
        memory = encoder_out.astype(self.compute_dtype)
        if reverse:
            logits, _ = self.decoder.forward_right(ys_in, tgt_mask, memory,
                                                   memory_mask)
        else:
            logits, _ = self.decoder.forward_left(ys_in, tgt_mask, memory,
                                                  memory_mask)
        return jax.nn.log_softmax(logits, axis=-1)


def build_asr_model(model_conf: dict, input_size: int, vocab_size: int,
                    use_global_cmvn: bool = False) -> ASRModel:
    """Construct ASRModel from a resolved `model_conf` dict (config.py)."""
    mc = dict(model_conf)
    dtype = jnp.dtype(mc.get("compute_dtype", "bfloat16"))
    return ASRModel(
        input_size=input_size,
        vocab_size=vocab_size,
        encoder_num_blocks=mc.get("encoder_num_blocks", 12),
        encoder_num_blocks_share=mc.get("encoder_num_blocks_share", 1),
        decoder_num_blocks=mc.get("decoder_num_blocks", 3),
        r_decoder_num_blocks=mc.get("r_decoder_num_blocks", 0),
        decoder_num_blocks_share=mc.get("decoder_num_blocks_share", 1),
        input_layer=mc.get("input_layer", "conv2d"),
        pos_enc_layer_type=mc.get("pos_enc_layer_type", "rel_pos"),
        d_model=mc.get("d_model", 256),
        attention_heads=mc.get("attention_heads", 4),
        linear_units=mc.get("linear_units", 1024),
        dropout_rate=mc.get("dropout_rate", 0.1),
        positional_dropout_rate=mc.get("positional_dropout_rate", 0.0),
        activation_type=mc.get("activation", mc.get("activation_type",
                                                    "swish")),
        macaron_style=mc.get("macaron_style", True),
        use_cnn_module=mc.get("use_cnn_module", True),
        cnn_module_kernel=mc.get("cnn_module_kernel", 15),
        causal=mc.get("causal", False),
        encoder_use_adapter=mc.get("encoder_use_adapter", False),
        decoder_use_adapter=mc.get("decoder_use_adapter", False),
        down_size=mc.get("down_size", 64),
        scalar=mc.get("scalar", 0.1),
        moe_experts=mc.get("moe_experts", 0),
        moe_top_k=mc.get("moe_top_k", 2),
        moe_capacity_factor=mc.get("moe_capacity_factor", 1.25),
        moe_aux_weight=mc.get("moe_aux_weight", 0.01),
        ctc_weight=mc.get("ctc_weight", 0.3),
        lsm_weight=mc.get("lsm_weight", 0.1),
        reverse_weight=mc.get("reverse_weight", 0.0),
        length_normalized_loss=mc.get("length_normalized_loss", False),
        use_global_cmvn=use_global_cmvn,
        tie_word_embedding=mc.get("tie_word_embedding", False),
        remat=mc.get("remat", False),
        ctc_impl=mc.get("ctc_impl", "optax"),
        static_chunk_size=mc.get("static_chunk_size", 0),
        num_left_chunks=mc.get("num_left_chunks", -1),
        use_dynamic_chunk=mc.get("use_dynamic_chunk", False),
        sequence_sharding=mc.get("sequence_sharding", False),
        compute_dtype=dtype,
    )
