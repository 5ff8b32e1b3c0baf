"""CTC greedy search — fully jitted.

Parity: reference openeat/models/asr_model.py:297-326 — per-frame argmax
over CTC posteriors, pad frames forced to eos, consecutive duplicates
and blanks removed. The collapse runs on device (sort-based compaction,
utils.common.ctc_collapse_device) so the whole decode is one XLA
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openeat_tpu.utils.common import IGNORE_ID, ctc_collapse_device


def ctc_greedy_search(ctc_log_probs: jax.Array, lens: jax.Array,
                      blank_id: int = 0, return_times: bool = False):
    """ctc_log_probs: [B, T, V]; lens: [B].

    Returns (hyps [B, T] int32 padded with IGNORE_ID, hyp_lens [B]);
    return_times appends each kept token's emission frame [B, T] int32
    (the first frame of its argmax run — onset convention; one frame =
    subsampling_rate x 10 ms of audio).
    """
    b, t, _ = ctc_log_probs.shape
    best = jnp.argmax(ctc_log_probs, axis=-1).astype(jnp.int32)  # [B,T]
    pad = jnp.arange(t)[None, :] >= lens[:, None]
    best = jnp.where(pad, blank_id, best)
    if return_times:
        hyps, times = ctc_collapse_device(best, blank_id, IGNORE_ID,
                                          return_positions=True)
        hyp_lens = jnp.sum(hyps != IGNORE_ID, axis=-1)
        return hyps, hyp_lens, times
    hyps = ctc_collapse_device(best, blank_id, IGNORE_ID)
    hyp_lens = jnp.sum(hyps != IGNORE_ID, axis=-1)
    return hyps, hyp_lens
