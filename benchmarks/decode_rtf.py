"""Decode real-time-factor benchmark on the flagship AIShell Conformer.

RTF = wall-clock decode time / audio duration, measured per mode on one
chip with a realistic batch (8 x ~10 s utterances). BASELINE target:
< 0.05 on a single v5e chip. Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_batch, _flagship_model
from openeat_tpu.decode.attention_beam import recognize as attention_decode
from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.rescoring import attention_rescoring
from openeat_tpu.models.asr_model import ASRModel


def main():
    b, t = 8, 1000  # 8 x 10 s utterances
    audio_sec = b * t * 0.01
    model = _flagship_model()
    batch = _example_batch(b=b, t=t, f=80, l=24)
    batch["features_length"] = jnp.full((b,), t, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["features_length"], batch["targets"],
                        batch["targets_length"])

    encode = jax.jit(lambda p, f, l: model.apply(
        p, f, l, method=ASRModel.encode))
    ctc_logp = jax.jit(lambda p, e: model.apply(
        p, e, method=ASRModel.ctc_log_probs))

    def run_greedy():
        enc, lens = encode(params, batch["features"],
                           batch["features_length"])
        return ctc_greedy_search(ctc_logp(params, enc), lens)[0]

    def run_prefix():
        enc, lens = encode(params, batch["features"],
                           batch["features_length"])
        return ctc_prefix_beam_search(ctc_logp(params, enc), lens,
                                      beam_size=10, max_hyp_len=64)[0]

    def run_attention():
        enc, lens = encode(params, batch["features"],
                           batch["features_length"])
        return attention_decode(model, params, enc, lens, beam_size=10,
                                max_steps=64)[0]

    def run_rescoring():
        enc, lens = encode(params, batch["features"],
                           batch["features_length"])
        nbest, nlens, nscores = ctc_prefix_beam_search(
            ctc_logp(params, enc), lens, beam_size=10, max_hyp_len=64)
        return attention_rescoring(model, params, enc, lens, nbest, nlens,
                                   nscores, ctc_weight=0.5,
                                   reverse_weight=0.3)[0]

    for name, fn in [("ctc_greedy_search", run_greedy),
                     ("ctc_prefix_beam_search", run_prefix),
                     ("attention", run_attention),
                     ("attention_rescoring", run_rescoring)]:
        r = fn()
        jax.block_until_ready(r)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n
        rtf = dt / audio_sec
        print(json.dumps({"metric": f"decode_rtf_{name}",
                          "value": round(rtf, 5), "unit": "RTF",
                          "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}))


if __name__ == "__main__":
    main()
