"""Per-token CTC timestamps + endpoint detection.

Timestamps follow the onset convention: a token's time is the first
frame of its argmax run (greedy) / the frame it first entered its
prefix (beam DP) — one encoder position = subsampling_rate x 10 ms.
The reference has no timestamp or endpointing support at all (its
decode returns bare token strings, reference openeat/bin/
recognize.py:222-231); both are part of the TPU build's serving story.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.endpoint import EndpointConfig, Endpointer
from openeat_tpu.models.asr_model import ASRModel

F, VOCAB = 20, 30
CHUNK, LEFT = 4, 2


def _lp_from_path(path, v, p=0.9):
    """[1, T, V] log-probs whose per-frame argmax follows `path`."""
    t = len(path)
    probs = np.full((t, v), (1.0 - p) / (v - 1), np.float64)
    probs[np.arange(t), path] = p
    return jnp.asarray(np.log(probs), jnp.float32)[None]


def test_greedy_times_oracle():
    """Hand-built argmax path: [b,2,2,b,3,3,1] -> hyp (2,3,1) with
    onset frames (1,4,6)."""
    lp = _lp_from_path([0, 2, 2, 0, 3, 3, 1], v=5)
    hyps, lens, times = ctc_greedy_search(lp, jnp.array([7]),
                                          return_times=True)
    n = int(lens[0])
    assert [int(x) for x in hyps[0][:n]] == [2, 3, 1]
    assert [int(x) for x in times[0][:n]] == [1, 4, 6]


def test_prefix_beam_times_oracle():
    """With near-deterministic posteriors the best prefix equals the
    greedy collapse and its emission times are the run onsets."""
    path = [0, 2, 2, 0, 3, 3, 0, 3, 1, 0]
    lp = _lp_from_path(path, v=5, p=0.95)
    nb, nl, ns, nt = ctc_prefix_beam_search(
        lp, jnp.array([len(path)]), beam_size=4, max_hyp_len=8,
        return_times=True)
    n = int(nl[0, 0])
    assert [int(x) for x in nb[0, 0][:n]] == [2, 3, 3, 1]
    assert [int(x) for x in nt[0, 0][:n]] == [1, 4, 7, 8]


def test_endpointer_rules():
    frame = lambda ms: int(ms / 40)
    # rule 1: silence-only stream ends after 5000 ms of blanks
    ep = Endpointer(frame_ms=40.0)
    assert not ep.feed([0] * (frame(5000) - 1))
    assert ep.feed([0])
    assert ep.detected  # latched
    # rule 2: speech, then 1000 ms of trailing blanks
    ep = Endpointer(frame_ms=40.0)
    assert not ep.feed([0, 5, 5, 0, 0])
    assert not ep.feed([7])           # speech resets the silence run
    assert not ep.feed([0] * (frame(1000) - 1))
    assert ep.feed([0])
    # rule 3: a never-pausing speaker is cut at 20000 ms
    ep = Endpointer(frame_ms=40.0)
    assert not ep.feed([3, 4] * (frame(20000) // 2 - 1))
    assert ep.feed([3, 4])
    # custom thresholds flow through
    ep = Endpointer(EndpointConfig(rule2_min_trailing_silence=200.0),
                    frame_ms=40.0)
    assert not ep.feed([5])
    assert ep.feed([0] * frame(200))


@pytest.fixture(scope="module")
def small_model():
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=1, reverse_weight=0.3,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="conv2d", causal=True, cnn_module_kernel=5,
        static_chunk_size=CHUNK, num_left_chunks=LEFT,
        dropout_rate=0.0, compute_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((1, 32, F)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, jnp.array([32]),
                        tgt, jnp.array([4]))
    return model, params


def test_streaming_greedy_times_match_offline(small_model):
    """The B=1 runtime's emission positions equal the offline greedy
    times over the same encoder rows (the streamed argmax path IS the
    offline one — tests/test_streaming.py proves the rows agree)."""
    from openeat_tpu.decode.streaming import StreamingRecognizer

    model, params = small_model
    rng = np.random.default_rng(11)
    wav = (rng.standard_normal(14500) * 3000).astype(np.float32)
    sr = StreamingRecognizer(model, params, chunk_size=CHUNK,
                             num_left_chunks=LEFT, num_mel_bins=F,
                             collect_encoder_out=True)
    sr.accept_waveform(wav)
    sr.finish()
    assert len(sr.times) == len(sr.hyp)
    assert sr.result_times_ms() == [p * 40.0 for p in sr.times]

    enc = jnp.concatenate([jnp.asarray(c) for c in sr.enc_chunks])[None]
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    hyps, lens, times = ctc_greedy_search(lp, jnp.array([enc.shape[1]]),
                                          return_times=True)
    n = int(lens[0])
    assert sr.hyp == [int(t) for t in hyps[0][:n]]
    assert sr.times == [int(t) for t in times[0][:n]]


def test_batch_rescoring_times_are_winners(small_model):
    """After finish(rescore=True) the handle's times are the winning
    prefix-beam hypothesis' emission frames — identical to the offline
    search + scoring over the same encoder rows."""
    from openeat_tpu.decode.rescoring import rescoring_scores
    from openeat_tpu.decode.streaming_batch import StreamingBatch
    from openeat_tpu.ops.fbank import num_frames

    model, params = small_model
    rng = np.random.default_rng(12)
    wav = (rng.standard_normal(13700) * 3000).astype(np.float32)
    batch = StreamingBatch(model, params, slots=2, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=5, max_hyp_len=24, enc_capacity=64)
    h = batch.open()
    batch.accept(h, wav)
    batch.run_ready()
    toks = batch.finish(h, rescore=True, ctc_weight=0.5,
                        reverse_weight=0.3)
    got_ms = h.result_times_ms()
    assert len(got_ms) == len(toks)
    assert got_ms == sorted(got_ms), "times must be non-decreasing"

    t_total = ((num_frames(len(wav), 400, 160) - 1) // 2 - 1) // 2
    enc = jnp.asarray(batch.encoder_out(h)[:t_total])[None]
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    nb, nl, ns, nt = ctc_prefix_beam_search(
        lp, jnp.array([t_total]), beam_size=5, max_hyp_len=24,
        return_times=True)
    score = rescoring_scores(model, params, enc, jnp.array([t_total]),
                             nb, nl, ns, ctc_weight=0.5,
                             reverse_weight=0.3)
    win = int(np.asarray(score)[0].argmax())
    n = int(nl[0, win])
    assert toks == [int(t) for t in np.asarray(nb[0, win])[:n]]
    assert got_ms == [float(t) * 40.0
                      for t in np.asarray(nt[0, win])[:n]]


def test_recognize_cli_timestamp_file(tmp_path):
    """bin/recognize --timestamp_file writes one JSONL row per
    utterance with len(times_ms) == len(tokens), in every
    CTC-alignment mode — and the result file is unchanged by asking
    for timestamps (the rescoring path switches to the return_index
    unpack either way)."""
    import json as json_mod

    import yaml

    from openeat_tpu.bin import recognize
    from openeat_tpu.models.asr_model import build_asr_model
    from openeat_tpu.utils import checkpoint as ckpt_lib
    from tests.make_tiny_data import build

    data = build(str(tmp_path / "data"), n_utts=4, seed=5,
                 min_dur=0.5, max_dur=1.0)
    model_conf = {
        "encoder_num_blocks": 2, "decoder_num_blocks": 1,
        "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
        "d_model": 32, "attention_heads": 2, "linear_units": 64,
        "input_layer": "conv2d", "cnn_module_kernel": 5,
        "dropout_rate": 0.0, "compute_dtype": "float32"}
    model = build_asr_model(model_conf, 80, data["vocab_size"])
    rng = np.random.default_rng(17)
    feats = jnp.asarray(rng.standard_normal((1, 32, 80)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, data["vocab_size"] - 1, (1, 4)),
                      jnp.int32)
    params = model.init(jax.random.PRNGKey(2), feats, jnp.array([32]),
                        tgt, jnp.array([4]))
    exp = tmp_path / "exp"
    ckpt_lib.save_checkpoint(str(exp), "epoch_0", params)
    cfg = {"input_size": 80, "vocab_size": data["vocab_size"],
           "model_conf": model_conf,
           "collate_conf": {"normalization": True}}
    with open(exp / "train.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    def run(mode, with_ts):
        out = str(tmp_path / f"hyp_{mode}_{with_ts}.txt")
        ts = str(tmp_path / f"ts_{mode}.jsonl")
        argv = ["--config", str(exp / "train.yaml"),
                "--checkpoint", str(exp / "epoch_0"),
                "--test_data", data["manifest"],
                "--dict", data["dict"],
                "--mode", mode, "--batch_size", "4",
                "--beam_size", "4", "--reverse_weight", "0.3",
                "--result_file", out]
        if with_ts:
            argv += ["--timestamp_file", ts]
        recognize.main(argv)
        hyps = dict(
            (ln.split(None, 1) + [""])[:2]
            for ln in open(out, encoding="utf-8") if ln.strip())
        rows = ([json_mod.loads(ln) for ln in open(ts, encoding="utf-8")]
                if with_ts else None)
        return hyps, rows

    for mode in ("ctc_greedy_search", "ctc_prefix_beam_search",
                 "attention_rescoring"):
        plain, _ = run(mode, with_ts=False)
        hyps, rows = run(mode, with_ts=True)
        assert hyps == plain, f"{mode}: timestamps changed hypotheses"
        assert {r["key"] for r in rows} == set(hyps)
        for r in rows:
            assert len(r["times_ms"]) == len(r["tokens"])
            assert r["times_ms"] == sorted(r["times_ms"])


def test_server_endpoint_and_event_times(small_model):
    """A server with endpointing finalizes on its own (rule 3 forced
    low) — the client never sends "end" — and every partial/final event
    carries per-token times_ms."""
    from openeat_tpu.runtime.client import AsrClient
    from openeat_tpu.runtime.server import AsrServer

    model, params = small_model
    char_dict = {f"t{i}": i for i in range(VOCAB)}
    srv = AsrServer(model, params, char_dict, port=0, slots=2,
                    chunk_size=CHUNK, num_left_chunks=LEFT,
                    enc_capacity=64, ctc_weight=0.5, reverse_weight=0.3,
                    endpoint=True,
                    endpoint_config=EndpointConfig(
                        rule3_min_utterance_length=400.0))
    host, port = srv.start()
    try:
        rng = np.random.default_rng(13)
        wav = np.round(rng.standard_normal(24000) * 3000
                       ).astype(np.float32)
        c = AsrClient(host, port)
        try:
            for i in range(0, len(wav), 3200):
                c.send_audio(wav[i: i + 3200])
                c.poll()
                if c.final is not None:
                    break
            # wait for the server-side endpoint final (no "end" sent)
            c.sock.settimeout(60.0)
            from openeat_tpu.runtime.server import recv_frame
            while c.final is None:
                frame = recv_frame(c.sock)
                assert frame is not None, "server closed without final"
                c._note(frame)
            assert c.final["endpoint"] is True
            assert len(c.final["times_ms"]) == len(c.final["tokens"])
            for p in c.partials:
                assert len(p["times_ms"]) == len(p["tokens"])
        finally:
            c.close()
    finally:
        srv.shutdown()
