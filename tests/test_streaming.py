"""Chunked (streaming-style) encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.utils.mask import chunk_mask

F, VOCAB = 20, 30


def test_chunk_mask_shape():
    m = np.asarray(chunk_mask(8, 2, num_left_chunks=1))
    # query in chunk c attends chunks [c-1, c]
    assert m[5, 2]  # q chunk 2 (pos 5), k chunk 1 (pos 2) -> visible
    assert not m[5, 1]  # k chunk 0 -> masked
    assert not m[2, 4]  # future chunk masked
    assert m[0, 0] and m[7, 7]


def test_chunked_encoder_causality(rng):
    """With chunked attention + causal convs, frames beyond the current
    chunk must not influence earlier chunk outputs."""
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="linear", causal=True, static_chunk_size=4,
        num_left_chunks=-1, dropout_rate=0.0, compute_dtype=jnp.float32)
    t = 16
    feats = jnp.asarray(rng.standard_normal((1, t, F)), jnp.float32)
    lens = jnp.array([t])
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, tgt,
                        jnp.array([4]))
    enc_full, _ = model.apply(params, feats, lens,
                              method=ASRModel.encode)
    # perturb the last chunk: first 3 chunks must be unchanged
    feats2 = feats.at[:, 12:, :].set(0.0)
    enc_pert, _ = model.apply(params, feats2, lens,
                              method=ASRModel.encode)
    np.testing.assert_allclose(np.asarray(enc_full[:, :12]),
                               np.asarray(enc_pert[:, :12]),
                               rtol=1e-4, atol=1e-5)
    # and the last chunk does change
    assert not np.allclose(np.asarray(enc_full[:, 12:]),
                           np.asarray(enc_pert[:, 12:]))


def test_streaming_matches_offline(rng):
    """Chunk-by-chunk streaming encoder == offline forward of the same
    chunked-mask model, and the streaming CTC partial equals offline
    greedy on the covered prefix."""
    from openeat_tpu.decode.streaming import StreamingRecognizer
    from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
    from openeat_tpu.ops.fbank import fbank

    chunk, left = 4, 2
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="conv2d", causal=True, cnn_module_kernel=5,
        static_chunk_size=chunk, num_left_chunks=left,
        dropout_rate=0.0, compute_dtype=jnp.float32)
    # fbank needs mel bins == input F
    n_samp = 16000
    wav = (rng.standard_normal(n_samp) * 3000).astype(np.float32)
    feats, flens = fbank(jnp.asarray(wav)[None], jnp.array([n_samp]),
                         num_mel_bins=F)
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flens, tgt,
                        jnp.array([4]))
    enc_full, enc_lens = model.apply(params, feats, flens,
                                     method=ASRModel.encode)

    sr = StreamingRecognizer(model, params, chunk_size=chunk,
                             num_left_chunks=left, num_mel_bins=F,
                             collect_encoder_out=True)
    # feed audio in awkward pieces
    outs = []
    pieces = np.split(wav, [1500, 5000, 5100, 9000, 12000])
    chunks_out = []
    for p in pieces:
        sr.accept_waveform(p)
    n_chunks = sr.offset // chunk
    assert n_chunks >= 4
    # offline greedy on the streamed prefix must match streaming partial
    t_cov = n_chunks * chunk
    lp_full = model.apply(params, enc_full[:, :t_cov],
                          method=ASRModel.ctc_log_probs)
    hyps, hyp_lens = ctc_greedy_search(lp_full, jnp.array([t_cov]))
    offline = [int(x) for x in hyps[0][: int(hyp_lens[0])]]
    assert sr.result() == offline
    # the streamed encoder outputs must match the offline encoder
    streamed = np.concatenate(sr.enc_chunks, axis=0)
    np.testing.assert_allclose(streamed,
                               np.asarray(enc_full[0][:t_cov]),
                               rtol=1e-3, atol=2e-4)


def test_chunked_training_runs(rng):
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="conv2d", causal=True, static_chunk_size=8,
        num_left_chunks=2, compute_dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 64, F)), jnp.float32)
    lens = jnp.array([64, 40])
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (2, 5)), jnp.int32)
    tlens = jnp.array([5, 3])
    params = model.init(jax.random.PRNGKey(0), feats, lens, tgt, tlens)
    m = model.apply(params, feats, lens, tgt, tlens)
    assert np.isfinite(float(m["loss"]))


def test_dynamic_chunk_training(rng):
    """Dynamic-chunk training: random chunk width per batch (rng-driven),
    deterministic eval unaffected."""
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="linear", causal=True, use_dynamic_chunk=True,
        dropout_rate=0.0, compute_dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 32, F)), jnp.float32)
    lens = jnp.array([32, 24])
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (2, 4)), jnp.int32)
    tlens = jnp.array([4, 3])
    params = model.init(jax.random.PRNGKey(0), feats, lens, tgt, tlens)
    m1 = model.apply(params, feats, lens, tgt, tlens, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    m2 = model.apply(params, feats, lens, tgt, tlens, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # different chunk draws -> different losses (dropout_rate is 0, so
    # the only randomness is the chunk mask)
    assert float(m1["loss"]) != float(m2["loss"])
    # eval path has no randomness
    e1 = model.apply(params, feats, lens, tgt, tlens)
    e2 = model.apply(params, feats, lens, tgt, tlens)
    np.testing.assert_allclose(float(e1["loss"]), float(e2["loss"]))


def test_running_normalization_stats():
    """The causal running normalizer (HostFrontend, shared by both
    runtimes) matches a numpy oracle of frames-so-far statistics (the
    streamable stand-in for the training frontend's per-utt
    normalization)."""
    from openeat_tpu.decode.streaming import HostFrontend

    rng = np.random.default_rng(0)
    fe = HostFrontend(4, 16000, "running")
    seen = []
    for _ in range(5):
        feats = rng.standard_normal((16, 4)).astype(np.float32) * 3 + 7
        fe._ingest(feats)
        seen.append(feats)
        got = fe.window(fe.n_frames - 8, 8)
        all_seen = np.concatenate(seen, axis=0)
        mean = all_seen.mean(0)
        var = all_seen.var(0)
        want = (all_seen[-8:] - mean) / np.sqrt(var + 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_running_norm_none_is_identity():
    from openeat_tpu.decode.streaming import HostFrontend

    fe = HostFrontend(2, 16000, "none")
    fe._ingest(np.ones((3, 2), np.float32) * 5)
    np.testing.assert_array_equal(fe.window(0, 3),
                                  np.ones((3, 2), np.float32) * 5)


def test_host_frontend_trims_buffers(rng):
    """Long-stream memory bound: the frontend drops samples already
    folded into frames and frames behind the consumer's window, while
    every window stays bit-identical to an untrimmed oracle."""
    from openeat_tpu.decode.streaming import HostFrontend

    fe = HostFrontend(4, 16000, "running")
    oracle = HostFrontend(4, 16000, "running")
    oracle._trim_samples = lambda: None  # keep everything
    piece = 3200  # 200 ms
    win, stride = 19, 16
    f0 = 0
    for i in range(50):  # 10 s of audio
        wav = (rng.standard_normal(piece) * 3000).astype(np.float32)
        fe.accept(wav)
        oracle.accept(wav)
        while fe.n_frames - f0 >= win:
            got = fe.window(f0, win)
            want = oracle.frames[f0: f0 + win]
            # "running" stats cover exactly the frames visible at this
            # window's end, [0, f0+win) — arrival-pattern-invariant
            # (see HostFrontend.window)
            seen = oracle.frames[: f0 + win].astype(np.float64)
            mean = seen.mean(0)
            var = np.maximum((seen ** 2).mean(0) - mean ** 2, 0.0)
            want = ((want - mean) / np.sqrt(var + 1e-8)).astype(
                np.float32)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
            f0 += stride
    assert fe.n_frames == oracle.n_frames > 900
    # bounded: the live buffers hold only the unconsumed tail, not 10 s
    assert len(fe.samples) < 4 * piece
    assert fe.frames.shape[0] < fe.n_frames / 4
    assert len(oracle.samples) == oracle.n_samples  # oracle untrimmed


def test_streaming_finish_flushes_tail(rng):
    """End-of-stream flush: a stream whose length is NOT a multiple of
    the chunk/frame-group sizes must produce the same hypothesis and
    encoder outputs as the offline forward over ALL frames — the recipe
    drive caught systematic suffix truncation without finish()."""
    from openeat_tpu.decode.streaming import StreamingRecognizer
    from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
    from openeat_tpu.ops.fbank import fbank, num_frames

    chunk, left = 4, 2
    model = ASRModel(
        input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
        decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
        d_model=32, attention_heads=2, linear_units=64,
        input_layer="conv2d", causal=True, cnn_module_kernel=5,
        static_chunk_size=chunk, num_left_chunks=left,
        dropout_rate=0.0, compute_dtype=jnp.float32)
    n_samp = 15000  # 92 frames -> 22 subsampled outputs = 5*4 + 2
    wav = (rng.standard_normal(n_samp) * 3000).astype(np.float32)
    nf = num_frames(n_samp, 400, 160)
    t_total = ((nf - 1) // 2 - 1) // 2
    assert t_total % chunk != 0  # the interesting case
    feats, _ = fbank(jnp.asarray(wav)[None], jnp.array([n_samp]),
                     num_mel_bins=F)
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats[:, :nf],
                        jnp.array([nf]), tgt, jnp.array([4]))
    enc_full, _ = model.apply(params, feats[:, :nf], jnp.array([nf]),
                              method=ASRModel.encode)
    lp = model.apply(params, enc_full[:, :t_total],
                     method=ASRModel.ctc_log_probs)
    hyps, hyp_lens = ctc_greedy_search(lp, jnp.array([t_total]))
    offline = [int(x) for x in hyps[0][: int(hyp_lens[0])]]

    sr = StreamingRecognizer(model, params, chunk_size=chunk,
                             num_left_chunks=left, num_mel_bins=F,
                             collect_encoder_out=True)
    for p in np.split(wav, [1500, 5000, 9100, 12000]):
        sr.accept_waveform(p)
    sr.finish()
    assert sr.offset >= t_total  # every output was produced
    streamed = np.concatenate(sr.enc_chunks, axis=0)[:t_total]
    np.testing.assert_allclose(streamed, np.asarray(enc_full[0][:t_total]),
                               rtol=1e-3, atol=2e-4)
    assert sr.result() == offline
    # idempotent: a second finish adds nothing
    assert sr.finish() == []
