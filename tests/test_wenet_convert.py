"""WeNet checkpoint converter tests: every torch-style key must land on
an existing flax param path with the right shape and layout."""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.utils.checkpoint import load_trained_modules
from openeat_tpu.utils.wenet_convert import convert_wenet_state_dict

D, V, F, HEADS, FF, K = 16, 30, 80, 2, 32, 7


def _our_params():
    m = ASRModel(input_size=F, vocab_size=V, encoder_num_blocks=2,
                 decoder_num_blocks=1, r_decoder_num_blocks=1,
                 d_model=D, attention_heads=HEADS, linear_units=FF,
                 cnn_module_kernel=K, compute_dtype=jnp.float32,
                 use_global_cmvn=True)
    return m, m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, F)),
                     jnp.array([32]), jnp.zeros((1, 4), jnp.int32),
                     jnp.array([4]))


def _wenet_state(rng):
    """Synthesize a WeNet-style state_dict with reference shapes."""
    s = {}
    r = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    s["encoder.global_cmvn.mean"] = r(F)
    s["encoder.global_cmvn.istd"] = r(F)
    s["encoder.embed.conv.0.weight"] = r(D, 1, 3, 3)
    s["encoder.embed.conv.0.bias"] = r(D)
    s["encoder.embed.conv.2.weight"] = r(D, D, 3, 3)
    s["encoder.embed.conv.2.bias"] = r(D)
    fsub = ((F - 1) // 2 - 1) // 2
    s["encoder.embed.out.0.weight"] = r(D, D * fsub)
    s["encoder.embed.out.0.bias"] = r(D)
    for i in range(2):
        p = f"encoder.encoders.{i}."
        for a in ("linear_q", "linear_k", "linear_v", "linear_out"):
            s[p + f"self_attn.{a}.weight"] = r(D, D)
            s[p + f"self_attn.{a}.bias"] = r(D)
        s[p + "self_attn.linear_pos.weight"] = r(D, D)
        s[p + "self_attn.pos_bias_u"] = r(HEADS, D // HEADS)
        s[p + "self_attn.pos_bias_v"] = r(HEADS, D // HEADS)
        for ff in ("feed_forward", "feed_forward_macaron"):
            s[p + f"{ff}.w_1.weight"] = r(FF, D)
            s[p + f"{ff}.w_1.bias"] = r(FF)
            s[p + f"{ff}.w_2.weight"] = r(D, FF)
            s[p + f"{ff}.w_2.bias"] = r(D)
        s[p + "conv_module.pointwise_conv1.weight"] = r(2 * D, D, 1)
        s[p + "conv_module.pointwise_conv1.bias"] = r(2 * D)
        s[p + "conv_module.depthwise_conv.weight"] = r(D, 1, K)
        s[p + "conv_module.depthwise_conv.bias"] = r(D)
        s[p + "conv_module.pointwise_conv2.weight"] = r(D, D, 1)
        s[p + "conv_module.pointwise_conv2.bias"] = r(D)
        s[p + "conv_module.norm.weight"] = r(D)
        s[p + "conv_module.norm.bias"] = r(D)
        for n in ("norm_ff", "norm_mha", "norm_conv", "norm_ff_macaron",
                  "norm_final"):
            s[p + f"{n}.weight"] = r(D)
            s[p + f"{n}.bias"] = r(D)
    s["encoder.after_norm.weight"] = r(D)
    s["encoder.after_norm.bias"] = r(D)
    s["ctc.ctc_lo.weight"] = r(V, D)
    s["ctc.ctc_lo.bias"] = r(V)
    for side in ("left_decoder", "right_decoder"):
        p = f"decoder.{side}."
        s[p + "embed.0.weight"] = r(V, D)
        for a in ("self_attn", "src_attn"):
            for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
                s[p + f"decoders.0.{a}.{lin}.weight"] = r(D, D)
                s[p + f"decoders.0.{a}.{lin}.bias"] = r(D)
        s[p + "decoders.0.feed_forward.w_1.weight"] = r(FF, D)
        s[p + "decoders.0.feed_forward.w_1.bias"] = r(FF)
        s[p + "decoders.0.feed_forward.w_2.weight"] = r(D, FF)
        s[p + "decoders.0.feed_forward.w_2.bias"] = r(D)
        for n in ("norm1", "norm2", "norm3"):
            s[p + f"decoders.0.{n}.weight"] = r(D)
            s[p + f"decoders.0.{n}.bias"] = r(D)
        s[p + "after_norm.weight"] = r(D)
        s[p + "after_norm.bias"] = r(D)
        s[p + "output_layer.weight"] = r(V, D)
        s[p + "output_layer.bias"] = r(V)
    s["some.concat_linear.weight"] = r(D, D)  # must be skipped
    return s


def test_convert_covers_full_tree(rng):
    model, params = _our_params()
    state = _wenet_state(rng)
    converted = convert_wenet_state_dict(state, D)
    flat_ours = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_conv = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(converted)[0]}
    # every converted tensor must exist in our tree with identical shape
    for k, v in flat_conv.items():
        assert k in flat_ours, f"converted key {k} not in model tree"
        assert v.shape == flat_ours[k].shape, (k, v.shape,
                                               flat_ours[k].shape)
    # and the conversion must cover the whole model
    missing = set(flat_ours) - set(flat_conv)
    assert not missing, f"unconverted params: {sorted(missing)[:8]}"


def test_convert_layouts(rng):
    state = _wenet_state(rng)
    conv = convert_wenet_state_dict(state, D)
    p = conv["params"]
    # Linear transpose
    np.testing.assert_allclose(
        p["ctc"]["ctc_lo"]["kernel"], state["ctc.ctc_lo.weight"].T)
    # Conv2d NCHW->HWIO
    np.testing.assert_allclose(
        p["encoder"]["embed"]["Conv_0"]["kernel"],
        state["encoder.embed.conv.0.weight"].transpose(2, 3, 1, 0))
    # depthwise [C,1,k]->[k,1,C]
    np.testing.assert_allclose(
        p["encoder"]["encoders"]["layer_0"]["conv_module"][
            "depthwise_conv"]["kernel"],
        state["encoder.encoders.0.conv_module.depthwise_conv.weight"]
        .transpose(2, 1, 0))
    # subsample projection (C,F)->(F,C) permutation
    w = state["encoder.embed.out.0.weight"]
    fsub = w.shape[1] // D
    got = p["encoder"]["embed"]["Dense_0"]["kernel"]
    want = w.reshape(D, D, fsub).transpose(2, 1, 0).reshape(D * fsub, D)
    np.testing.assert_allclose(got, want)


def test_partial_init_with_converted(rng):
    model, params = _our_params()
    conv = convert_wenet_state_dict(_wenet_state(rng), D)
    new, copied = load_trained_modules(params, conv,
                                       ["encoder", "ctc", "decoder"])
    assert len(copied) > 50


def test_convert_config_disables_per_utt_normalization():
    """A converted WeNet config must feed RAW fbank: the checkpoint's
    global CMVN (applied inside the encoder) and the frontend's per-utt
    normalization are exclusive (train.py enforces this on the train
    path; the convert path must emit the flag itself)."""
    from openeat_tpu.ops.frontend import FrontendConfig
    from openeat_tpu.utils.wenet_convert import convert_wenet_config

    wcfg = {"encoder": "conformer",
            "encoder_conf": {"output_size": 256, "attention_heads": 4},
            "decoder": "bitransformer",
            "decoder_conf": {"num_blocks": 3, "r_num_blocks": 3},
            "model_conf": {"ctc_weight": 0.3},
            "dataset_conf": {"fbank_conf": {"num_mel_bins": 80}},
            "output_dim": 4233}
    cfg = convert_wenet_config(wcfg)
    assert cfg["collate_conf"]["normalization"] is False
    fe = FrontendConfig.from_collate_conf(cfg["collate_conf"])
    assert fe.normalization is False
