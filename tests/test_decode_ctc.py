"""CTC decode equivalence tests: device implementations vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.numpy_ref import ctc_greedy_ref, ctc_prefix_beam_ref
from openeat_tpu.utils.common import IGNORE_ID


def _rand_logprobs(rng, b, t, v, peaky=2.0):
    x = rng.standard_normal((b, t, v)) * peaky
    return jax.nn.log_softmax(jnp.asarray(x, jnp.float32), axis=-1)


def test_ctc_greedy_matches_ref(rng):
    b, t, v = 4, 20, 6
    lp = _rand_logprobs(rng, b, t, v)
    lens = jnp.array([20, 15, 7, 1])
    hyps, hyp_lens = ctc_greedy_search(lp, lens)
    for i in range(b):
        want = ctc_greedy_ref(np.asarray(lp[i]), int(lens[i]))
        got = [int(x) for x in hyps[i] if x != IGNORE_ID]
        assert got == want
        assert int(hyp_lens[i]) == len(want)


@pytest.mark.parametrize("seed,t,v,beam", [(0, 12, 5, 4), (1, 25, 8, 6),
                                           (2, 40, 12, 10), (3, 8, 4, 3)])
def test_prefix_beam_matches_ref(seed, t, v, beam):
    rng = np.random.default_rng(seed)
    b = 3
    lp = _rand_logprobs(rng, b, t, v, peaky=1.5)
    lens = jnp.array([t, max(t // 2, 2), max(t - 3, 1)])
    prefixes, plens, scores = ctc_prefix_beam_search(
        lp, lens, beam_size=beam, max_hyp_len=t)
    for i in range(b):
        want = ctc_prefix_beam_ref(np.asarray(lp[i]), int(lens[i]), beam)
        got = []
        for k in range(beam):
            pre = tuple(int(x) for x in prefixes[i, k, : int(plens[i, k])])
            got.append((pre, float(scores[i, k])))
        # the top hypothesis must match exactly; remaining beams match as
        # score-sorted sets (ties may reorder)
        assert got[0][0] == want[0][0], (got[0], want[0])
        np.testing.assert_allclose(got[0][1], want[0][1], rtol=1e-4)
        want_scores = np.array([s for _, s in want])
        got_scores = np.array([s for _, s in got])
        finite = np.isfinite(want_scores)
        np.testing.assert_allclose(got_scores[finite], want_scores[finite],
                                   rtol=1e-3, atol=1e-4)
        assert set(p for p, s in got if np.isfinite(s)) == set(
            p for p, s in want if np.isfinite(s))


def test_prefix_beam_peaky_matches_ref(rng):
    """Near-one-hot posteriors: long hypotheses stress the prefix
    bookkeeping; top-1 must still match the dict oracle exactly."""
    b, t, v = 2, 30, 7
    lp = _rand_logprobs(rng, b, t, v, peaky=8.0)
    lens = jnp.array([30, 22])
    p_hyps, p_lens, p_scores = ctc_prefix_beam_search(lp, lens, beam_size=5,
                                                      max_hyp_len=t)
    for i in range(b):
        want = ctc_prefix_beam_ref(np.asarray(lp[i]), int(lens[i]), 5)
        p = tuple(int(x) for x in p_hyps[i, 0, : int(p_lens[i, 0])])
        assert p == want[0][0]
        np.testing.assert_allclose(float(p_scores[i, 0]), want[0][1],
                                   rtol=1e-4)


def test_prefix_beam_padded_frames_are_noops(rng):
    b, t, v = 1, 10, 5
    lp = _rand_logprobs(rng, b, t, v)
    lp_long = jnp.concatenate(
        [lp, jnp.zeros((b, 6, v), jnp.float32)], axis=1)
    lens = jnp.array([10])
    p1 = ctc_prefix_beam_search(lp, lens, beam_size=4, max_hyp_len=16)
    p2 = ctc_prefix_beam_search(lp_long, lens, beam_size=4, max_hyp_len=16)
    np.testing.assert_allclose(np.asarray(p1[2]), np.asarray(p2[2]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(p2[0]))
