"""Statistical guarantees of the synthetic quality-proxy corpus
(benchmarks/make_structured_corpus.py).

The lmhard profile's whole point is an information asymmetry: the
favored pair member is keyed by the previous prior_context=3 groups, so
lower-order text statistics are near-uniform while the full-order
conditional carries the designed 0.8 prior. If that property drifted,
the LM-fusion margin measured by benchmarks/run_recipe_tpu.sh lmhard
would become meaningless — these tests pin it with cheap host-side
sampling (no audio synthesis, no device).
"""

import statistics
from collections import defaultdict

import numpy as np

from benchmarks.make_structured_corpus import (HARD, LMHARD, PROFILES,
                                               ContextGrammar, _char_group,
                                               _grammar, _n_groups,
                                               sample_sentence)


def _pair_member_stats(diff, n_sents, ctx_len, seed=0):
    """{context_tuple: [count_member0, count_member1]} over sampled text."""
    g = _grammar(diff)
    rng = np.random.default_rng(seed)
    ng = _n_groups(diff)
    cells = defaultdict(lambda: [0, 0])
    for _ in range(n_sents):
        sent = sample_sentence(rng, g, diff)
        gs = [ng] * ctx_len + [_char_group(diff, c) for c in sent]
        for i in range(1, len(sent)):
            idx = diff.chars.index(sent[i])
            if idx < 2 * diff.n_pairs:
                ctx = tuple(gs[i: i + ctx_len])
                cells[(ctx, idx // 2)][idx % 2] += 1
    return cells


def test_profiles_registry():
    assert set(PROFILES) == {"v1", "hard", "lmhard"}
    assert PROFILES["lmhard"].prior_context == 3
    assert PROFILES["lmhard"].lm_text_n > 0
    assert PROFILES["hard"].prior_context == 0


def test_hard_profile_unchanged():
    """hard must reproduce the committed r3 corpus draws bit-for-bit
    (benchmarks/results/r3_recipe_hard comparability)."""
    g = _grammar(HARD)
    rng = np.random.default_rng(0)
    sent = sample_sentence(rng, g, HARD)
    assert "".join(sent) == "小热他热日星月夏小前东们低气小"


def test_lmhard_grammar_is_context_grammar():
    g = _grammar(LMHARD)
    assert isinstance(g, ContextGrammar)
    assert g.ctx_order == 3
    # deterministic favored coins across instances
    g2 = _grammar(LMHARD)
    for ctx in [(39, 39, 12), (0, 5, 30), (7, 7, 7)]:
        for pair in range(LMHARD.n_pairs):
            assert g.favored(ctx, pair) == g2.favored(ctx, pair)


def test_lmhard_sampler_determinism_and_validity():
    g = _grammar(LMHARD)
    a = [sample_sentence(np.random.default_rng(3), g, LMHARD)
         for _ in range(20)]
    b = [sample_sentence(np.random.default_rng(3), g, LMHARD)
         for _ in range(20)]
    assert a == b
    for sent in a:
        assert LMHARD.min_len <= len(sent) <= LMHARD.max_len
        # first token is never a pair member (no left context)
        assert LMHARD.chars.index(sent[0]) >= 2 * LMHARD.n_pairs
        # every transition is allowed by the predecessor group's slots
        for prev, cur in zip(sent, sent[1:]):
            g1 = _char_group(LMHARD, prev)
            pair_ids, single_ids = g.slots[g1]
            idx = LMHARD.chars.index(cur)
            if idx < 2 * LMHARD.n_pairs:
                assert idx // 2 in pair_ids
            else:
                assert idx - 2 * LMHARD.n_pairs in single_ids


def test_lmhard_prior_orders():
    """Full-order conditional = pair_prior exactly; bigram marginal
    near-uniform. This is the asymmetry the LM-fusion margin rests on."""
    g = _grammar(LMHARD)
    rng = np.random.default_rng(5)
    ng = _n_groups(LMHARD)
    k = LMHARD.prior_context
    hit = tot = 0
    for _ in range(3000):
        sent = sample_sentence(rng, g, LMHARD)
        gs = [ng] * k + [_char_group(LMHARD, c) for c in sent]
        for i in range(1, len(sent)):
            idx = LMHARD.chars.index(sent[i])
            if idx < 2 * LMHARD.n_pairs:
                tot += 1
                fav = g.favored(tuple(gs[i: i + k]), idx // 2)
                hit += int(idx % 2 == fav)
    assert tot > 5000
    assert abs(hit / tot - LMHARD.pair_prior) < 0.02
    # bigram (single-predecessor) majority-member prior stays close to
    # chance, far below the designed full-order 0.8
    lo = _pair_member_stats(LMHARD, 8000, 1)
    lo_probs = [max(c) / sum(c) for c in lo.values() if sum(c) >= 100]
    assert len(lo_probs) >= 100
    assert statistics.mean(lo_probs) < 0.63


def test_make_text_split(tmp_path):
    from benchmarks.make_structured_corpus import make_text_split
    from dataclasses import replace
    diff = replace(LMHARD, lm_text_n=50)
    g = _grammar(diff)
    make_text_split(str(tmp_path), "lm_text", 50, 11, g, diff)
    lines = (tmp_path / "data" / "lm_text" / "text").read_text(
        encoding="utf-8").splitlines()
    assert len(lines) == 50
    utt, txt = lines[0].split(maxsplit=1)
    assert utt == "lm_text000000"
    assert all(c in diff.chars for c in txt)
