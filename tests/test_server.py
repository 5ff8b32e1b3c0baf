"""Serving runtime tests (runtime/server.py + runtime/client.py).

The server must produce, over real sockets with concurrent clients,
exactly the hypotheses the batched streaming runtime produces when
driven directly — continuous batching, admission queueing beyond the
slot count, partial events, and the rescoring finalization all
exercised end-to-end. No reference equivalent exists (the reference's
only decode parallelism is offline shell fan-out,
reference examples/aishell/run.sh:186-219).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.models.asr_model import ASRModel

F, VOCAB = 20, 30
CHUNK, LEFT = 4, 2
CHAR_DICT = {f"t{i}": i for i in range(VOCAB)}


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


def _int16_wavs(rng, lens):
    # integer-valued so the client's float->int16 conversion is lossless
    # and the server path is bit-identical to direct StreamingBatch use
    return [np.round(rng.standard_normal(n) * 3000).astype(np.float32)
            for n in lens]


def _expected(model, params, wavs, **finish_kw):
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    out = []
    batch = StreamingBatch(model, params, slots=1, chunk_size=CHUNK,
                           num_left_chunks=LEFT, num_mel_bins=F,
                           beam_size=10, max_hyp_len=64, enc_capacity=64)
    for w in wavs:
        h = batch.open()
        batch.accept(h, w)
        batch.run_ready()
        out.append(batch.finish(h, **finish_kw))
        batch.close(h)
    return out


@pytest.fixture(scope="module")
def server(small_model):
    from openeat_tpu.runtime.server import AsrServer

    model, params = small_model
    srv = AsrServer(model, params, CHAR_DICT, port=0, slots=2,
                    chunk_size=CHUNK, num_left_chunks=LEFT,
                    enc_capacity=64, ctc_weight=0.5, reverse_weight=0.3,
                    final_mode="attention_rescoring")
    # the model's input_size drives num_mel_bins inside StreamingBatch
    srv.start()
    yield srv
    srv.shutdown()


def _drive_client(host, port, wav, results, idx, piece=3200):
    from openeat_tpu.runtime.client import AsrClient

    c = AsrClient(host, port)
    try:
        for i in range(0, len(wav), piece):
            c.send_audio(wav[i: i + piece])
            c.poll()
        final = c.finish()
        results[idx] = (final, list(c.partials))
    finally:
        c.close()


def test_concurrent_sessions_match_direct(server, small_model):
    """4 concurrent clients against a 2-slot server (so 2 must queue
    for admission) each get exactly the direct runtime's rescored
    hypothesis."""
    model, params = small_model
    rng = np.random.default_rng(1)
    wavs = _int16_wavs(rng, [16000, 11500, 15000, 7300])
    expected = _expected(model, params, wavs, rescore=True,
                         ctc_weight=0.5, reverse_weight=0.3)

    host, port = server.addr
    results = {}
    threads = [threading.Thread(target=_drive_client,
                                args=(host, port, w, results, i))
               for i, w in enumerate(wavs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert sorted(results) == [0, 1, 2, 3], f"missing finals: {results}"
    for i in range(4):
        final, partials = results[i]
        assert final["tokens"] == expected[i], f"client {i} diverged"
        assert final["text"] == "".join(f"t{t}" for t in expected[i])
        assert abs(final["audio_s"] - len(wavs[i]) / 16000) < 1e-6
    # at least one session must have received streaming partials
    assert any(r[1] for r in results.values()), "no partials emitted"


def test_partials_prefix_greedy(server, small_model):
    """Partial events concatenate to the greedy hypothesis the direct
    runtime produces (rescoring then replaces it in the final)."""
    model, params = small_model
    rng = np.random.default_rng(2)
    wav = _int16_wavs(rng, [14000])[0]
    greedy = _expected(model, params, [wav], rescore=False)[0]

    host, port = server.addr
    results = {}
    _drive_client(host, port, wav, results, 0, piece=2000)
    final, partials = results[0]
    streamed = [t for p in partials for t in p["tokens"]]
    # partials cover a prefix of the greedy hyp (the tail may only be
    # flushed inside finish(), after which no more partials are sent)
    assert streamed == greedy[: len(streamed)]


def test_end_without_audio(server):
    from openeat_tpu.runtime.client import AsrClient

    host, port = server.addr
    c = AsrClient(host, port)
    try:
        final = c.finish()
        assert final["tokens"] == [] and final["text"] == ""
    finally:
        c.close()


def test_slot_recycling_across_sessions(server, small_model):
    """Sequential sessions far beyond the slot count keep producing
    correct results (slots are reset and reused)."""
    model, params = small_model
    rng = np.random.default_rng(3)
    wavs = _int16_wavs(rng, [9000, 9000, 9000, 9000, 9000])
    expected = _expected(model, params, wavs, rescore=True,
                         ctc_weight=0.5, reverse_weight=0.3)
    host, port = server.addr
    for i, w in enumerate(wavs):
        results = {}
        _drive_client(host, port, w, results, 0)
        assert results[0][0]["tokens"] == expected[i], f"session {i}"
