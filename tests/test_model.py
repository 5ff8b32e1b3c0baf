"""ASRModel unit tests: shapes, losses, gradients, config variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.models.asr_model import ASRModel, build_asr_model

VOCAB = 50
BATCH, T, F = 2, 64, 40


def _batch(rng):
    feats = jnp.asarray(rng.standard_normal((BATCH, T, F)), jnp.float32)
    feat_lens = jnp.array([T, T // 2])
    targets = jnp.asarray(rng.integers(1, VOCAB - 1, (BATCH, 8)), jnp.int32)
    targets = targets.at[1, 5:].set(-1)
    target_lens = jnp.array([8, 5])
    return feats, feat_lens, targets, target_lens


def _tiny_model(**kw):
    defaults = dict(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=1, reverse_weight=0.3,
        d_model=32, attention_heads=2, linear_units=64,
        compute_dtype=jnp.float32)
    defaults.update(kw)
    return ASRModel(**defaults)


@pytest.mark.parametrize("variant", ["conformer", "transformer"])
def test_forward_loss(rng, variant):
    model = _tiny_model(
        use_cnn_module=(variant == "conformer"),
        macaron_style=(variant == "conformer"),
        pos_enc_layer_type="rel_pos" if variant == "conformer" else "abs_pos")
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    metrics = model.apply(params, *batch)
    assert set(metrics) >= {"loss", "loss_ctc", "loss_att", "acc"}
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    expect = 0.3 * metrics["loss_ctc"] + 0.7 * metrics["loss_att"]
    np.testing.assert_allclose(float(metrics["loss"]), float(expect),
                               rtol=1e-5)


def test_gradients_flow(rng):
    model = _tiny_model()
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)

    def loss_fn(p):
        return model.apply(p, *batch, deterministic=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_dropout_rngs(rng):
    model = _tiny_model()
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    m1 = model.apply(params, *batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    m2 = model.apply(params, *batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(m1["loss"]) != float(m2["loss"])


def test_weight_sharing_param_count(rng):
    batch = _batch(rng)
    full = _tiny_model(encoder_num_blocks=4, encoder_num_blocks_share=1)
    shared = _tiny_model(encoder_num_blocks=4, encoder_num_blocks_share=2)
    p_full = full.init(jax.random.PRNGKey(0), *batch)
    p_shared = shared.init(jax.random.PRNGKey(0), *batch)
    n = lambda p: sum(x.size for x in jax.tree.leaves(p))
    assert n(p_shared) < n(p_full)


def test_adapters(rng):
    model = _tiny_model(encoder_use_adapter=True, decoder_use_adapter=True)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("adapter" in p for p in paths)
    metrics = model.apply(params, *batch)
    assert np.isfinite(float(metrics["loss"]))


def test_encode_and_decoder_logits_methods(rng):
    model = _tiny_model()
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    feats, feat_lens, targets, target_lens = batch
    enc, enc_lens = model.apply(params, feats, feat_lens,
                                method=ASRModel.encode)
    assert enc.shape[0] == BATCH and enc.shape[2] == 32
    assert int(enc_lens[0]) == enc.shape[1]
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-3)
    ys_in = jnp.concatenate(
        [jnp.full((BATCH, 1), VOCAB - 1, jnp.int32),
         jnp.where(targets < 0, 0, targets)], axis=1)
    dl = model.apply(params, enc, enc_lens, ys_in, target_lens + 1,
                     method=ASRModel.decoder_logits)
    assert dl.shape == (BATCH, 9, VOCAB)
    dr = model.apply(params, enc, enc_lens, ys_in, target_lens + 1, True,
                     method=ASRModel.decoder_logits)
    assert dr.shape == (BATCH, 9, VOCAB)
    assert not np.allclose(np.asarray(dl), np.asarray(dr))


def test_build_from_config(rng):
    mc = {"d_model": 32, "attention_heads": 2, "linear_units": 64,
          "encoder_num_blocks": 2, "decoder_num_blocks": 1,
          "r_decoder_num_blocks": 0, "reverse_weight": 0.0,
          "compute_dtype": "float32"}
    model = build_asr_model(mc, input_size=F, vocab_size=VOCAB)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    metrics = model.apply(params, *batch)
    assert np.isfinite(float(metrics["loss"]))


def test_ctc_only_mode(rng):
    model = _tiny_model(ctc_weight=1.0, r_decoder_num_blocks=0,
                        reverse_weight=0.0)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    metrics = model.apply(params, *batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics["loss_ctc"]), rtol=1e-6)


def test_bf16_compute_dtype(rng):
    model = _tiny_model(compute_dtype=jnp.bfloat16)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    # params stay f32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(params)
               if jnp.issubdtype(x.dtype, jnp.floating))
    metrics = model.apply(params, *batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("layer,rate", [("conv2d6", 6), ("conv2d8", 8)])
def test_subsampling_variants(rng, layer, rate):
    model = _tiny_model(input_layer=layer, r_decoder_num_blocks=0,
                        reverse_weight=0.0)
    feats = jnp.asarray(rng.standard_normal((2, 96, F)), jnp.float32)
    lens = jnp.array([96, 64])
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (2, 4)), jnp.int32)
    tlens = jnp.array([4, 3])
    params = model.init(jax.random.PRNGKey(0), feats, lens, tgt, tlens)
    enc, enc_lens = model.apply(params, feats, lens,
                                method=ASRModel.encode)
    # subsampled length ~ T / rate
    assert abs(enc.shape[1] - 96 // rate) <= 2
    assert int(enc_lens[1]) < int(enc_lens[0])
    m = model.apply(params, feats, lens, tgt, tlens)
    assert np.isfinite(float(m["loss"]))


def test_tied_embedding(rng):
    model = _tiny_model(tie_word_embedding=True, r_decoder_num_blocks=0,
                        reverse_weight=0.0)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), *batch)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert not any("output_layer" in k for k in flat)
    m = model.apply(params, *batch)
    assert np.isfinite(float(m["loss"]))


def test_relpos_fused_scores_match(rng):
    """FUSED_RELPOS_SCORES=True must be numerically identical to the
    two-einsum path (same params, same inputs)."""
    import jax
    import jax.numpy as jnp

    from openeat_tpu.modules import attention as attn_mod
    from openeat_tpu.modules.attention import RelPositionMultiHeadedAttention

    b, t, d, h = 3, 17, 32, 4
    m = RelPositionMultiHeadedAttention(num_heads=h, d_model=d,
                                        dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, t, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, 1, t)) > 0.2)
    params = m.init(jax.random.PRNGKey(0), x, x, x, mask, pos)
    old = attn_mod.FUSED_RELPOS_SCORES
    try:
        attn_mod.FUSED_RELPOS_SCORES = True
        y_fused = m.apply(params, x, x, x, mask, pos)
        attn_mod.FUSED_RELPOS_SCORES = False
        y_two = m.apply(params, x, x, x, mask, pos)
    finally:
        attn_mod.FUSED_RELPOS_SCORES = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_two),
                               atol=1e-5, rtol=1e-5)
