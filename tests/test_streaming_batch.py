"""Batched streaming runtime tests (decode/streaming_batch.py).

Verifies VERDICT r3 items 5+7: S interleaved streams through ONE
vmapped chunk step agree token-for-token with the sequential B=1
runtime, the chunk-carried CTC prefix-beam state equals the offline
tensor DP, and the end-of-stream attention-rescoring finalization
matches the offline rescoring pipeline on the same encoder rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.ops.fbank import fbank, num_frames

F, VOCAB = 20, 30
CHUNK, LEFT = 4, 2


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


def _wavs(rng, lens):
    return [(rng.standard_normal(n) * 3000).astype(np.float32)
            for n in lens]


def test_batch_matches_sequential(small_model):
    """4 interleaved streams == 4 sequential B=1 runs (greedy tokens
    and encoder rows)."""
    from openeat_tpu.decode.streaming import StreamingRecognizer
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    model, params = small_model
    rng = np.random.default_rng(1)
    wavs = _wavs(rng, [16000, 11500, 15000, 7300])

    seq_hyps, seq_encs = [], []
    for w in wavs:
        sr = StreamingRecognizer(model, params, chunk_size=CHUNK,
                                 num_left_chunks=LEFT, num_mel_bins=F,
                                 collect_encoder_out=True)
        sr.accept_waveform(w)
        sr.finish()
        seq_hyps.append(sr.result())
        seq_encs.append(np.concatenate(sr.enc_chunks, axis=0))

    batch = StreamingBatch(model, params, slots=4, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=5, max_hyp_len=24, enc_capacity=64)
    # weights must be committed device arrays: numpy leaves are
    # re-uploaded by jit on EVERY chunk step (the axon client retains
    # each transfer — a 2k-utt streamed drive OOMed at 130 GB RSS)
    host_params = jax.tree.map(np.asarray, params)
    b2 = StreamingBatch(model, host_params, slots=1, chunk_size=CHUNK,
                        num_left_chunks=LEFT, num_mel_bins=F)
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree.leaves(b2.params))
    handles = [batch.open() for _ in range(4)]
    # interleave: feed uneven pieces round-robin, stepping as we go
    cuts = [np.split(w, [1500, 5000, 9100]) for w in wavs]
    for r in range(4):
        for h, pieces in zip(handles, cuts):
            if r < len(pieces):
                batch.accept(h, pieces[r])
        batch.run_ready()
    finals = [batch.finish(h, rescore=False) for h in handles]
    for i, h in enumerate(handles):
        assert finals[i] == seq_hyps[i], f"stream {i} diverged"
        t = ((num_frames(len(wavs[i]), 400, 160) - 1) // 2 - 1) // 2
        np.testing.assert_allclose(
            batch.encoder_out(h)[:t], seq_encs[i][:t],
            rtol=1e-3, atol=2e-4, err_msg=f"stream {i} encoder rows")


def test_streamed_beam_equals_offline_dp(small_model):
    """The chunk-carried prefix-beam state finalizes to the same nbest
    as the offline one-scan tensor DP over the same log-probs."""
    from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    model, params = small_model
    rng = np.random.default_rng(2)
    wav = _wavs(rng, [15000])[0]
    batch = StreamingBatch(model, params, slots=2, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=5, max_hyp_len=24, enc_capacity=64)
    h = batch.open()
    batch.accept(h, wav)
    batch.run_ready()
    batch.finish(h, rescore=False)
    t_total = ((num_frames(len(wav), 400, 160) - 1) // 2 - 1) // 2

    enc = jnp.asarray(batch.encoder_out(h)[:t_total])[None]
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    nb, nl, ns = ctc_prefix_beam_search(lp, jnp.array([t_total]),
                                        beam_size=5, max_hyp_len=24)
    bnb, bnl, bns, _ = batch._finalize_beam(
        jax.tree.map(lambda a: a[h.slot], batch.state.beam))
    np.testing.assert_array_equal(np.asarray(bnb), np.asarray(nb[0]))
    np.testing.assert_array_equal(np.asarray(bnl), np.asarray(nl[0]))
    np.testing.assert_allclose(np.asarray(bns), np.asarray(ns[0]),
                               rtol=1e-5, atol=1e-5)


def test_streamed_rescoring_matches_offline(small_model):
    """finish(rescore=True) == offline attention_rescoring over the
    streamed encoder rows and nbest."""
    from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
    from openeat_tpu.decode.rescoring import attention_rescoring
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    model, params = small_model
    rng = np.random.default_rng(3)
    wav = _wavs(rng, [14200])[0]
    batch = StreamingBatch(model, params, slots=2, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=5, max_hyp_len=24, enc_capacity=64)
    h = batch.open()
    batch.accept(h, wav)
    batch.run_ready()
    streamed = batch.finish(h, rescore=True, ctc_weight=0.5,
                            reverse_weight=0.3)
    t_total = ((num_frames(len(wav), 400, 160) - 1) // 2 - 1) // 2

    enc = jnp.asarray(batch.encoder_out(h)[:t_total])[None]
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    nb, nl, ns = ctc_prefix_beam_search(lp, jnp.array([t_total]),
                                        beam_size=5, max_hyp_len=24)
    best, best_lens, _ = attention_rescoring(
        model, params, enc, jnp.array([t_total]), nb, nl, ns,
        ctc_weight=0.5, reverse_weight=0.3)
    offline = [int(t) for t in np.asarray(best[0])[: int(best_lens[0])]]
    assert streamed == offline


def test_slot_reuse_is_clean(small_model):
    """close() + open() hands back a fully reset slot: the same audio
    decodes identically before and after another stream used the slot."""
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    model, params = small_model
    rng = np.random.default_rng(4)
    wav_a, wav_b = _wavs(rng, [12000, 9000])
    batch = StreamingBatch(model, params, slots=1, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=5, max_hyp_len=24, enc_capacity=64)
    h1 = batch.open()
    batch.accept(h1, wav_a)
    batch.run_ready()
    first = batch.finish(h1, rescore=False)
    batch.close(h1)

    h2 = batch.open()
    batch.accept(h2, wav_b)
    batch.run_ready()
    batch.finish(h2, rescore=False)
    batch.close(h2)

    h3 = batch.open()
    batch.accept(h3, wav_a)
    batch.run_ready()
    again = batch.finish(h3, rescore=False)
    assert again == first

    with pytest.raises(RuntimeError):
        batch.open()  # h3 still holds the only slot


def test_running_norm_arrival_invariance(small_model):
    """Under "running" normalization the hypothesis must depend only on
    the audio, not on HOW it arrived (piece sizes / whether chunk steps
    interleave with accepts): the running stats fold exactly the frames
    visible at each window end (HostFrontend.window). Regression for a
    round-3 bug where stats covered whatever was buffered at step time,
    so the serving runtime (big async pieces) decoded the same stream
    differently from the CLI (fixed 200 ms pieces)."""
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    model, params = small_model
    rng = np.random.default_rng(9)
    wav = _wavs(rng, [13000])[0]

    def run(pieces, interleave_steps):
        batch = StreamingBatch(model, params, slots=2, chunk_size=CHUNK,
                               num_left_chunks=LEFT, num_mel_bins=F,
                               normalization="running", beam_size=5,
                               max_hyp_len=24, enc_capacity=64)
        h = batch.open()
        for p in pieces:
            batch.accept(h, p)
            if interleave_steps:
                batch.run_ready()
        toks = batch.finish(h, rescore=True, ctc_weight=0.5)
        batch.close(h)
        return toks

    runs = [
        run([wav[i: i + 2400] for i in range(0, len(wav), 2400)], True),
        run([wav[i: i + 2400] for i in range(0, len(wav), 2400)], False),
        run([wav], False),
        run([wav[i: i + 5100] for i in range(0, len(wav), 5100)], True),
    ]
    assert all(r == runs[0] for r in runs), runs


def test_stream_recognize_cli_slots(tmp_path):
    """bin/stream_recognize --slots 4 (batched lockstep runtime) emits
    the SAME hypotheses as --slots 1 (sequential B=1 runtime) over a
    real manifest, under running normalization; rescoring finalization
    also produces a full result file."""
    import yaml

    from openeat_tpu.bin import stream_recognize
    from openeat_tpu.utils import checkpoint as ckpt_lib
    from tests.make_tiny_data import build

    data = build(str(tmp_path / "data"), n_utts=6, seed=3,
                 min_dur=0.5, max_dur=1.2)
    model_conf = {
        "encoder_num_blocks": 2, "decoder_num_blocks": 1,
        "r_decoder_num_blocks": 1, "reverse_weight": 0.3,
        "d_model": 32, "attention_heads": 2, "linear_units": 64,
        "input_layer": "conv2d", "causal": True, "cnn_module_kernel": 5,
        "static_chunk_size": 4, "num_left_chunks": 2,
        "dropout_rate": 0.0, "compute_dtype": "float32"}
    from openeat_tpu.models.asr_model import build_asr_model
    model = build_asr_model(model_conf, 80, data["vocab_size"])
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal((1, 32, 80)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, data["vocab_size"] - 1, (1, 4)),
                      jnp.int32)
    params = model.init(jax.random.PRNGKey(5), feats, jnp.array([32]),
                        tgt, jnp.array([4]))
    exp = tmp_path / "exp"
    ckpt_lib.save_checkpoint(str(exp), "epoch_0", params)
    cfg = {"input_size": 80, "vocab_size": data["vocab_size"],
           "model_conf": model_conf,
           "collate_conf": {"normalization": True}}
    with open(exp / "train.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    def run(extra, out_name):
        out = str(tmp_path / out_name)
        stream_recognize.main([
            "--config", str(exp / "train.yaml"),
            "--checkpoint", str(exp / "epoch_0"),
            "--test_data", data["manifest"],
            "--dict", data["dict"],
            "--result_file", out,
            "--chunk_size", "4", "--num_left_chunks", "2",
            "--piece_ms", "150"] + extra)
        with open(out, encoding="utf-8") as f:
            return {ln.split(None, 1)[0]: (ln.split(None, 1) + [""])[1].strip()
                    for ln in f if ln.strip()}

    # greedy finalization on both sides: slots=1 + greedy takes the
    # sequential B=1 runtime, slots=4 the batched lockstep runtime
    # (the default final_mode=attention_rescoring is honored at ANY
    # slot count, so the greedy comparison must ask for greedy)
    h1 = run(["--final_mode", "ctc_greedy_search"], "h1.txt")
    h4 = run(["--slots", "4", "--final_mode", "ctc_greedy_search"],
             "h4.txt")
    assert set(h1) == set(data["texts"]) == set(h4)
    assert h1 == h4, "batched CLI diverged from sequential CLI"
    hr = run(["--slots", "3", "--final_mode", "attention_rescoring",
              "--reverse_weight", "0.3", "--enc_capacity", "64"],
             "hr.txt")
    assert set(hr) == set(data["texts"])
    # slots=1 with the default (rescoring) final_mode routes through the
    # batched runtime as one lockstep stream — same hypotheses as S=3
    hr1 = run(["--reverse_weight", "0.3", "--enc_capacity", "64"],
              "hr1.txt")
    assert hr1 == hr, "slots=1 rescoring diverged from slots=3"
