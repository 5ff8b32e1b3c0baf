"""Language model tests: AR/masked losses, fusion scoring, ARPA n-gram."""

import os
import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.lm.ngram import ArpaLM
from openeat_tpu.models.language_model import LanguageModel
from openeat_tpu.utils.common import IGNORE_ID

VOCAB = 20


def _lm(**kw):
    d = dict(vocab_size=VOCAB, d_model=16, attention_heads=2,
             linear_units=32, num_blocks=2, dropout_rate=0.0,
             compute_dtype=jnp.float32)
    d.update(kw)
    return LanguageModel(**d)


def _tokens(rng, b=3, l=7):
    toks = jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)), jnp.int32)
    lens = jnp.array([l, l - 2, l - 4])
    pos = jnp.arange(l)[None, :]
    toks = jnp.where(pos < lens[:, None], toks, IGNORE_ID)
    return toks, lens


def test_ar_lm_loss_and_grads(rng):
    lm = _lm(autoregressive=True)
    toks, lens = _tokens(rng)
    params = lm.init(jax.random.PRNGKey(0), toks, lens)
    out = lm.apply(params, toks, lens)
    assert np.isfinite(float(out["loss"]))
    g = jax.grad(lambda p: lm.apply(p, toks, lens)["loss"])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_masked_lm_loss(rng):
    lm = _lm(autoregressive=False)
    toks, lens = _tokens(rng)
    masked = jnp.where(jnp.asarray(rng.random(toks.shape) < 0.3) &
                       (toks != IGNORE_ID), toks, IGNORE_ID)
    inputs = jnp.where(masked != IGNORE_ID, VOCAB - 1, toks)
    params = lm.init(jax.random.PRNGKey(0), inputs, lens, masked)
    out = lm.apply(params, inputs, lens, masked)
    assert np.isfinite(float(out["loss"]))


def test_lm_log_probs_normalized_and_causal(rng):
    lm = _lm(autoregressive=True)
    toks, lens = _tokens(rng)
    params = lm.init(jax.random.PRNGKey(0), toks, lens)
    lp = lm.apply(params, toks, lens, method=LanguageModel.log_probs)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0,
                               rtol=1e-4)
    # causality: changing a later token must not change earlier scores
    toks2 = toks.at[:, -1].set(5)
    lp2 = lm.apply(params, toks2, lens, method=LanguageModel.log_probs)
    np.testing.assert_allclose(np.asarray(lp[:, :-1]),
                               np.asarray(lp2[:, :-1]), atol=1e-5)


def test_arpa_lm(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tHELLO\t-0.3
-0.9\tWORLD\t-0.4
-2.0\t<unk>

\\2-grams:
-0.2\t<s> HELLO
-0.3\tHELLO WORLD
-0.4\tWORLD </s>

\\end\\
""")
    lm = ArpaLM.load(str(arpa))
    assert lm.order == 2
    # full path via bigrams: P(HELLO|<s>) P(WORLD|HELLO) P(</s>|WORLD)
    np.testing.assert_allclose(lm.score("HELLO WORLD"), -0.2 - 0.3 - 0.4,
                               rtol=1e-6)
    # backoff path: P(HELLO|WORLD) unseen -> bo(WORLD) + P(HELLO)
    got = lm.score("WORLD HELLO", bos=False, eos=False)
    want = -0.9 + (-0.4 + -0.8)  # P(WORLD) + bo(WORLD)+P(HELLO)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # OOV hits <unk>
    assert lm.score("XYZ", bos=False, eos=False) == -2.0


ARPA_TEXT = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tHELLO\t-0.3
-0.9\tWORLD\t-0.4
-2.0\t<unk>

\\2-grams:
-0.2\t<s> HELLO
-0.3\tHELLO WORLD
-0.4\tWORLD </s>

\\end\\
"""


def test_binary_lm_matches_arpa(tmp_path):
    """The mmap binary format must score identically to the source ARPA
    (tools/build_binary_lm.py is the kenlm build_binary analog)."""
    from openeat_tpu.lm.ngram import BinaryNgramLM, load_lm
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA_TEXT)
    lm = ArpaLM.load(str(arpa))
    binp = str(tmp_path / "lm.bin")
    lm.save_binary(binp)
    blm = load_lm(binp)
    assert isinstance(blm, BinaryNgramLM)
    assert blm.order == lm.order
    for sent, kw in [("HELLO WORLD", {}),
                     ("WORLD HELLO", dict(bos=False, eos=False)),
                     ("XYZ", dict(bos=False, eos=False)),
                     ("HELLO HELLO WORLD XYZ WORLD", {})]:
        np.testing.assert_allclose(blm.score(sent, **kw),
                                   lm.score(sent, **kw), rtol=1e-6)


def test_load_lm_dispatch(tmp_path):
    import gzip as _gzip

    import pytest

    from openeat_tpu.lm.ngram import load_lm
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA_TEXT)
    assert isinstance(load_lm(str(arpa)), ArpaLM)
    gz = tmp_path / "lm.arpa.gz"
    with _gzip.open(gz, "wt") as f:
        f.write(ARPA_TEXT)
    assert isinstance(load_lm(str(gz)), ArpaLM)
    # kenlm binaries require the kenlm package -> actionable error
    klm = tmp_path / "lm.klm"
    klm.write_bytes(b"mmap lm http://kheafield.com/code format version 5\n"
                    + b"\x00" * 64)
    with pytest.raises(ValueError, match="kenlm"):
        load_lm(str(klm))


def test_build_binary_lm_cli(tmp_path):
    import subprocess
    import sys

    from openeat_tpu.lm.ngram import load_lm
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA_TEXT)
    out = str(tmp_path / "lm.bin")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable,
                    os.path.join(repo, "tools/build_binary_lm.py"),
                    str(arpa), out], check=True)
    blm = load_lm(out)
    np.testing.assert_allclose(blm.score("HELLO WORLD"), -0.9, rtol=1e-6)
