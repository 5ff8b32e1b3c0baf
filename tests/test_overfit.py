"""Learning sanity: a tiny model must overfit one batch until greedy
decode reproduces the training transcripts exactly.

This is the hermetic stand-in for the reference's recipe-level WER
gates (SURVEY.md §4): it exercises frontend -> encoder -> joint loss ->
optimizer -> CTC decode end-to-end and proves gradients drive the
system to zero training error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.parallel.train_step import build_train_step, init_state
from openeat_tpu.utils.common import IGNORE_ID
from openeat_tpu.utils.optim import build_optimizer

VOCAB, F = 12, 20


def test_overfit_single_batch(rng):
    b, t, l = 4, 80, 5
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=64, attention_heads=2, linear_units=128,
        input_layer="linear", dropout_rate=0.0, ctc_weight=0.5,
        compute_dtype=jnp.float32)
    # distinct per-class feature patterns so the task is learnable
    targets = jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)), jnp.int32)
    proto = rng.standard_normal((VOCAB, F)).astype(np.float32) * 2
    feats = np.zeros((b, t, F), np.float32)
    seg = t // l
    for i in range(b):
        for j in range(l):
            feats[i, j * seg:(j + 1) * seg] = proto[int(targets[i, j])]
    feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.05
    batch = {"features": jnp.asarray(feats),
             "features_length": jnp.full((b,), t, jnp.int32),
             "targets": targets,
             "targets_length": jnp.full((b,), l, jnp.int32)}

    tx, _ = build_optimizer(3e-3, 30)
    state = init_state(model, tx, batch, seed=3)
    step = jax.jit(build_train_step(model, tx))
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(150):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        if first is None:
            first = float(m["loss"])
    final = float(m["loss"])
    assert final < first * 0.1, (first, final)

    enc, enc_lens = model.apply(state.params, batch["features"],
                                batch["features_length"],
                                method=ASRModel.encode)
    lp = model.apply(state.params, enc, method=ASRModel.ctc_log_probs)
    hyps, hyp_lens = ctc_greedy_search(lp, enc_lens)
    correct = 0
    for i in range(b):
        hyp = [int(x) for x in hyps[i] if x != IGNORE_ID]
        want = [int(x) for x in targets[i]]
        correct += hyp == want
    assert correct >= b - 1, f"only {correct}/{b} exactly decoded"
