"""tools/train_ngram.py: interpolated modified-KN ARPA estimator.

Properties that pin the estimator independently of its own code:
normalization (sum_w p(w | ctx) == 1 under ARPA backoff lookup for any
context), train-data likelihood beating a uniform model, and exact
backoff arithmetic on a hand-checkable corpus. Round-trips through
openeat_tpu.lm.ngram.ArpaLM (the production scorer) and the binary
format.
"""

import math
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from openeat_tpu.lm.ngram import ArpaLM, load_lm

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

# Skewed on purpose: "a b" dominates, "c b" never occurs. (A symmetric
# toy corpus where every word follows every other makes KN continuation
# counts equal and the distributions legitimately flat — useless for
# ordering assertions.)
CORPUS = (
    ["a b a b"] * 10
    + ["a c a c"] * 5
    + ["b a b a"] * 3
    + ["a b c a", "c a b a", "a a b b"]
)


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    d = tmp_path_factory.mktemp("ngram")
    text = d / "text.txt"
    text.write_text("\n".join(f"utt{i} {s}" for i, s in enumerate(CORPUS)),
                    encoding="utf-8")
    out = d / "lm.arpa"
    subprocess.run([sys.executable, os.path.join(TOOLS, "train_ngram.py"),
                    str(text), str(out), "--order", "3",
                    "--tokenizer", "space"], check=True)
    return str(out)


def _cond_logprob(lm, ctx, w):
    """p(w|ctx) via the scorer's own backoff lookup."""
    return lm._word_logprob(tuple(ctx), w)


def test_normalization_all_contexts(arpa):
    """sum_w 10^logp(w|ctx) == 1 for unigram, seen-bigram and
    seen-trigram contexts (the defining property of a proper ARPA)."""
    lm = ArpaLM.load(arpa)
    vocab = ["a", "b", "c", "</s>", "<unk>"]
    for ctx in ([], ["a"], ["b"], ["c"], ["<s>"], ["a", "b"],
                ["b", "a"], ["<s>", "a"]):
        total = sum(10.0 ** _cond_logprob(lm, ctx, w) for w in vocab)
        assert total == pytest.approx(1.0, abs=2e-3), (ctx, total)


def test_beats_uniform_on_train_data(arpa):
    """Average train-data log-likelihood beats the uniform model (a
    single rare sentence may legitimately score below uniform under
    KN; the aggregate must not)."""
    lm = ArpaLM.load(arpa)
    v = 5  # a b c </s> <unk>
    total = sum(lm.score(s) for s in CORPUS)
    uniform = sum(len(s.split()) + 1 for s in CORPUS) * math.log10(1 / v)
    assert total > uniform + 5.0  # decisively better, in log10
    # and the dominant pattern is near its ceiling
    assert lm.score("a b a b") > 5 * math.log10(1 / v) + 2.0


def test_unseen_word_gets_unk_mass(arpa):
    lm = ArpaLM.load(arpa)
    lp = _cond_logprob(lm, [], "<unk>")
    assert -99.0 < lp < math.log10(0.5)


def test_bigram_ordering_matches_counts(arpa):
    """"a b" is the dominant bigram while "c b" never occurs (pure
    backoff): the seen bigram must dominate by a wide margin."""
    lm = ArpaLM.load(arpa)
    p_ab = _cond_logprob(lm, ["a"], "b")
    p_cb = _cond_logprob(lm, ["c"], "b")
    assert p_ab > p_cb + math.log10(2.0)  # at least 2x


def test_binary_roundtrip(arpa, tmp_path):
    lm = ArpaLM.load(arpa)
    bin_path = str(tmp_path / "lm.bin")
    lm.save_binary(bin_path)
    blm = load_lm(bin_path)
    for s in CORPUS + ["c c c", "a a a a"]:
        assert blm.score(s) == pytest.approx(lm.score(s), abs=1e-4)


def test_cjk_char_tokenizer(tmp_path):
    text = tmp_path / "text.txt"
    lines = [f"u{i} 你好你好" for i in range(8)] + ["u8 好你", "u9 你好"]
    text.write_text("\n".join(lines) + "\n", encoding="utf-8")
    out = tmp_path / "lm.arpa"
    subprocess.run([sys.executable, os.path.join(TOOLS, "train_ngram.py"),
                    str(text), str(out), "--order", "2"], check=True)
    lm = ArpaLM.load(str(out))
    assert lm.score("你 好") > lm.score("好 好")


def test_estimate_to_arpalm_composes_without_file_roundtrip(tmp_path):
    """estimate() emits backoff=None for grams with no continuation; the
    in-memory estimate()->ArpaLM composition must score identically to
    the write_arpa->load file path (regression: None backoff crashed
    _word_logprob; benchmarks/hard_probe.py fusion leg)."""
    from tools.train_ngram import estimate, write_arpa
    sents = [s.split() for s in CORPUS]
    for order in (3, 4):
        direct = ArpaLM(estimate(sents, order), order)
        path = str(tmp_path / f"lm{order}.arpa")
        write_arpa(path, direct.ngrams, order)
        loaded = ArpaLM.load(path)
        for s in CORPUS + ["c c c", "a a a a", "b c a b c"]:
            assert direct.score(s) == pytest.approx(loaded.score(s),
                                                    abs=1e-4)
