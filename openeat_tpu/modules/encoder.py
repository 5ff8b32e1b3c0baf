"""Encoder stacks (flax.linen).

Parity: reference openeat/modules/encoder.py — `Encoder` (:25-110), a bare
pre-norm block stack used by the LanguageModel, and `TransformerEncoder`
(:113-229): optional GlobalCMVN -> subsampling embed -> N blocks -> final
LayerNorm (eps 1e-5). Conformer mode (use_cnn_module) selects rel-pos
attention (encoder.py:183-187). Weight sharing: `num_blocks //
num_blocks_share` physical layers, each applied `num_blocks_share`
times (encoder.py:202,225-227) — in flax, re-calling the same submodule
shares parameters.

TPU notes: optional per-layer rematerialization trades FLOPs for HBM;
compute dtype is configurable (bf16 on the MXU by default); optional
sequence parallelism shards block activations' time axis over the
'model' mesh axis; `forward_chunk` is the streaming inference step
(attention K/V history + conv caches, the reference's decode caches).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.cmvn import GlobalCMVN
from openeat_tpu.modules.embedding import (NoPositionalEncoding,
                                           PositionalEncoding,
                                           RelPositionalEncoding,
                                           sinusoid_table)
from openeat_tpu.modules.encoder_layer import EncoderLayer
from openeat_tpu.modules.subsampling import SUBSAMPLE_CLASSES

POS_ENC_CLASSES = {
    "abs_pos": PositionalEncoding,
    "rel_pos": RelPositionalEncoding,
    "no_pos": NoPositionalEncoding,
}


class Encoder(nn.Module):
    """Block stack without embedding/subsampling (encoder.py:25-110)."""

    d_model: int = 256
    dropout_rate: float = 0.1
    attention_heads: int = 4
    linear_units: int = 2048
    activation: Callable = jax.nn.silu
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    moe_experts: int = 0           # >0: MoE main FFN (beyond-reference)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    num_blocks: int = 6
    num_blocks_share: int = 1
    sequence_sharding: bool = False  # shard time over the 'model' axis
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=())
        self.layers = [
            layer_cls(
                d_model=self.d_model,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                macaron_style=self.macaron_style,
                use_cnn_module=self.use_cnn_module,
                cnn_module_kernel=self.cnn_module_kernel,
                causal=self.causal,
                use_adapter=self.use_adapter,
                down_size=self.down_size,
                scalar=self.scalar,
                moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks // self.num_blocks_share)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="after_norm")

    def _applications(self):
        return [layer for layer in self.layers
                for _ in range(self.num_blocks_share)]

    def __call__(self, xs: jax.Array, mask: jax.Array, pos_emb: jax.Array,
                 mask_pad: jax.Array | None = None, *,
                 deterministic: bool = True) -> jax.Array:
        def seq_shard(x):
            # sequence parallelism (SP): keep block activations sharded
            # [data, model, -] on the time axis; GSPMD all-gathers K/V
            # inside attention and re-shards after. Requires an ambient
            # mesh (jax.sharding.set_mesh). Not in the reference
            # (SURVEY.md §2.7) — scale-up axis for long utterances.
            if not self.sequence_sharding:
                return x
            try:
                amesh = jax.sharding.get_abstract_mesh()
                model_size = dict(amesh.shape).get("model", 1)
            except Exception:
                model_size = 1
            if model_size <= 1 or x.shape[1] % model_size != 0:
                return x  # unsharded time dim (bucket T to a multiple)
            from jax.sharding import PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                x, P("data", "model", None))

        xs = seq_shard(xs)
        for layer in self._applications():
            xs = layer(xs, mask, pos_emb, mask_pad,
                       deterministic=deterministic)
            xs = seq_shard(xs)
        return self.after_norm(xs)

    def forward_chunk(self, xs: jax.Array, k_caches, v_caches,
                      kv_mask: jax.Array, cnn_caches, pos_emb: jax.Array):
        """Streaming step across the stack. Caches are per-application
        tuples; returns (out, new_k_tuple, new_v_tuple, new_cnn_tuple)
        where k/v entries are the CHUNK's new keys/values (the caller
        rolls them into the right-aligned history)."""
        new_k, new_v, new_cnn = [], [], []
        for idx, layer in enumerate(self._applications()):
            xs, k, v, c = layer.forward_chunk(
                xs, k_caches[idx], v_caches[idx], kv_mask,
                cnn_caches[idx], pos_emb)
            new_k.append(k)
            new_v.append(v)
            new_cnn.append(c)
        return (self.after_norm(xs), tuple(new_k), tuple(new_v),
                tuple(new_cnn))


class TransformerEncoder(nn.Module):
    """Full ASR encoder: CMVN -> subsample -> blocks (encoder.py:113-229)."""

    input_size: int = 80
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    d_model: int = 256
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_heads: int = 4
    linear_units: int = 2048
    activation: Callable = jax.nn.silu
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    moe_experts: int = 0           # >0: MoE main FFN (beyond-reference)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    num_blocks: int = 6
    num_blocks_share: int = 1
    use_global_cmvn: bool = False
    static_chunk_size: int = 0     # >0: chunked (streaming-style) attention
    num_left_chunks: int = -1      # -1: unlimited left context
    use_dynamic_chunk: bool = False  # train with random chunk sizes
    sequence_sharding: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def subsampling_rate(self) -> int:
        return {"linear": 1, "conv2d": 4, "conv2d6": 6, "conv2d8": 8}[
            self.input_layer]

    def setup(self):
        if self.use_global_cmvn:
            self.global_cmvn = GlobalCMVN(self.input_size,
                                          name="global_cmvn")
        pos_enc = POS_ENC_CLASSES[self.pos_enc_layer_type](
            self.d_model, self.positional_dropout_rate, name="pos_enc")
        sub_kwargs = {}
        if self.input_layer == "linear":
            sub_kwargs["dropout_rate"] = self.dropout_rate
        self.embed = SUBSAMPLE_CLASSES[self.input_layer](
            self.d_model, pos_enc, name="embed", **sub_kwargs)
        self.encoders = Encoder(
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            activation=self.activation,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            causal=self.causal,
            use_adapter=self.use_adapter,
            down_size=self.down_size,
            scalar=self.scalar,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            num_blocks=self.num_blocks,
            num_blocks_share=self.num_blocks_share,
            sequence_sharding=self.sequence_sharding,
            remat=self.remat,
            dtype=self.dtype,
            name="encoders",
        )

    def __call__(self, xs: jax.Array, xs_lens: jax.Array,
                 *, deterministic: bool = True
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """xs: [B, T, F] features; xs_lens: [B].

        Returns (encoder_out [B, T', D], out_lens [B], pos_emb [1, T', D]).
        """
        if self.use_global_cmvn:
            xs = self.global_cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, pos_emb, out_lens = self.embed(xs, xs_lens,
                                           deterministic=deterministic)
        from openeat_tpu.utils.mask import (chunk_mask, dynamic_chunk_mask,
                                            make_non_pad_mask)
        mask_pad = make_non_pad_mask(out_lens, xs.shape[1])[:, None, :]
        mask = mask_pad  # [B, 1, T]
        t = xs.shape[1]
        if self.use_dynamic_chunk and not deterministic:
            # WeNet-style dynamic chunk draw per batch: 50% full-context,
            # else a random chunk in [1, 25]; trains one model usable at
            # any streaming chunk size
            key = self.make_rng("dropout")
            u = jax.random.randint(key, (), 1, max(t, 2))
            cs = jnp.where(u > t // 2, t, u % 25 + 1)
            cm = dynamic_chunk_mask(t, cs, self.num_left_chunks)
            mask = mask & cm[None, :, :]
        elif self.static_chunk_size > 0:
            cm = chunk_mask(t, self.static_chunk_size,
                            self.num_left_chunks)
            mask = mask & cm[None, :, :]  # [B, T, T]
        xs = self.encoders(xs, mask, pos_emb, mask_pad,
                           deterministic=deterministic)
        return xs, out_lens, pos_emb

    def forward_chunk(self, feat_window: jax.Array, offset: jax.Array,
                      k_caches, v_caches, cache_len: jax.Array,
                      cnn_caches, valid_len: jax.Array | None = None):
        """Streaming step on a RAW FEATURE window.

        feat_window: [B, W, F] where W = chunk_frames*rate + right
        context (rate/context from the subsampling layer: x4 needs
        W = 4*c + 7 for c output frames); offset: scalar absolute output
        position of this chunk's first frame; k/v_caches:
        per-application [B, Lc, H, Dk] right-aligned histories with
        `cache_len` valid trailing slots; cnn_caches: [B, kernel-1, D].

        Returns (chunk_out [B, c, D], new_k, new_v, new_cnn) where new
        k/v are the chunk's keys/values to roll into the history.
        """
        if self.use_global_cmvn:
            feat_window = self.global_cmvn(feat_window)
        feat_window = feat_window.astype(self.dtype)
        b, w, _ = feat_window.shape
        lens = jnp.full((b,), w, jnp.int32)
        xs, _, _ = self.embed(feat_window, lens, offset=offset,
                              deterministic=True)
        t_chunk = xs.shape[1]
        l_cache = k_caches[0].shape[1]
        # kv validity: trailing cache_len cache slots + the chunk's
        # first valid_len positions (valid_len < t_chunk on the FINAL,
        # zero-padded chunk of a stream — attention must not read the
        # padding; None = whole chunk valid)
        if valid_len is None:
            valid_len = jnp.asarray(t_chunk, jnp.int32)
        slot = jnp.arange(l_cache + t_chunk)[None, None, :]
        in_cache = (slot >= l_cache - cache_len) & (slot < l_cache)
        in_chunk = (slot >= l_cache) & (slot - l_cache < valid_len)
        kv_mask = jnp.broadcast_to(in_cache | in_chunk,
                                   (b, 1, l_cache + t_chunk))
        # absolute-position table for the kv window: slot i has absolute
        # position offset - (l_cache - i), matching the full forward's
        # pe-by-key-absolute-position convention (no rel_shift)
        pos_emb = sinusoid_table(l_cache + t_chunk, self.d_model,
                                 xs.dtype, offset=offset - l_cache)[None]
        return self.encoders.forward_chunk(xs, k_caches, v_caches,
                                           kv_mask, cnn_caches, pos_emb)
