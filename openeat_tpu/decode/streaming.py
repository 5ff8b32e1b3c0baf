"""Online (streaming) recognition: chunked encoder + incremental CTC.

The reference ships streaming *hooks* (causal convs, conv caches,
decoder caches — convolution.py:43-50,92-104) but no online runtime;
this is the full streaming inference path:

- audio arrives in arbitrary pieces (`accept_waveform`), fbank frames
  are computed incrementally (25 ms window / 10 ms shift — each frame
  depends only on its own 400 samples, so chunking is exact);
- the encoder runs chunk-by-chunk via `forward_chunk` with right-aligned
  attention K/V histories (num_left_chunks * chunk_size positions) and
  per-layer conv caches — numerically identical to the offline forward
  of a model trained with `static_chunk_size`/`causal` masks
  (tests/test_streaming.py);
- CTC greedy partial hypotheses update after every chunk.

All device work is a single jitted step with static shapes; only the
ring-buffer bookkeeping lives on the host.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.decode.endpoint import EndpointConfig, Endpointer
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.ops import fbank as fbank_mod

_STEP_CACHE: dict = {}
_FBANK_CACHE: dict = {}


def _get_fbank_group_fn(rate: int, mel: int, group_samples: int):
    """One jitted incremental-fbank function per (rate, mel, group).

    Must be shared across StreamingRecognizer instances: a per-instance
    `@jax.jit` closure is a fresh function object, so every new stream
    re-traces (and re-enters the compile-cache round-trip) — measured as
    the dominant cost when decoding many utterances over the
    remote-compile tunnel."""
    key = (rate, mel, group_samples)
    fn = _FBANK_CACHE.get(key)
    if fn is None:
        # Pin to the HOST CPU backend: this is the host half of the
        # pipeline, but an unpinned jit follows the default platform —
        # on the remote-tunnel box every 16-frame group became a full
        # TPU round trip (measured 1.5 s per 10 s of audio in
        # benchmarks/streaming_profile.py, the dominant streaming cost)
        # AND contended with the chunk steps on the chip.
        cpu = jax.local_devices(backend="cpu")[0]

        @jax.jit
        def jfn(seg):
            feats, _ = fbank_mod.fbank(
                seg[None], jnp.array([group_samples]),
                sample_rate=rate, num_mel_bins=mel)
            return feats[0]

        def fn(seg):
            # committed-CPU input makes the jit compile/run on CPU
            return jfn(jax.device_put(np.asarray(seg, np.float32), cpu))

        _FBANK_CACHE[key] = fn
    return fn


class HostFrontend:
    """Host-side incremental feature pipeline for ONE stream: sample
    buffering, group-wise fbank extraction, causal running
    normalization, and the end-of-stream tail flush. Shared by the B=1
    runtime (StreamingRecognizer) and every StreamingBatch slot so the
    flush/normalization logic — whose absence/divergence produced real
    e2e bugs (suffix truncation, raw-feature feed) — exists exactly
    once.

    Incremental fbank is exact: each frame depends only on its own
    `frame_len` samples, so extracting in groups reproduces offline
    fbank (up to ~1e-6 float reassociation across the power-of-2
    group-size buckets' compiled widths); the flush group is
    zero-padded but over-count frames are discarded.
    "running" normalization applies the training frontend's per-utt
    mean/var formula with frames-so-far statistics (the streamable
    causal approximation; use global CMVN models for exactness).

    Host memory is bounded for arbitrarily long streams: samples
    already folded into extracted frames and frames behind the
    consumer's window are trimmed (both buffers keep an absolute base
    index, so the public API stays in absolute positions)."""

    FRAME_GROUP = 16
    # largest frames-per-call bucket for backlog extraction: a caller
    # that feeds seconds of audio at once (serving catch-up, the
    # throughput drives) otherwise pays one jit dispatch per 16-frame
    # group — measured as the top lifecycle bucket at S>=32
    # (benchmarks/results/r5_streaming/lifecycle_probe.log). Power-of-2
    # buckets 16..512 bound the compile count at 6.
    MAX_GROUP_FRAMES = 512

    def __init__(self, mel: int, rate: int, normalization: str = "none"):
        assert normalization in ("none", "running"), normalization
        self.mel = mel
        self.rate = rate
        self.normalization = normalization
        self.frame_len = int(rate * 0.025)
        self.frame_shift = int(rate * 0.010)
        self.group_samples = ((self.FRAME_GROUP - 1) * self.frame_shift
                              + self.frame_len)
        self._fbank_group = _get_fbank_group_fn(rate, mel,
                                                self.group_samples)
        self.samples = np.zeros((0,), np.float32)
        self._samples_base = 0   # absolute index of samples[0]
        self.frames = np.zeros((0, mel), np.float32)
        self._frames_base = 0    # absolute index of frames[0]
        self.n_frames_done = 0
        self._nsum = np.zeros((mel,), np.float64)
        self._nsumsq = np.zeros((mel,), np.float64)
        self._nn = 0

    @property
    def n_samples(self) -> int:
        """Absolute count of samples accepted so far."""
        return self._samples_base + len(self.samples)

    @property
    def n_frames(self) -> int:
        """Absolute count of fbank frames extracted so far."""
        return self._frames_base + self.frames.shape[0]

    def accept(self, wav) -> None:
        self.samples = np.concatenate([self.samples,
                                       np.asarray(wav, np.float32)])
        self._extract_full_groups()

    def _ingest(self, feats: np.ndarray) -> None:
        self.frames = np.concatenate([self.frames, feats], axis=0)

    def _trim_samples(self) -> None:
        # samples before the next group's start are never re-read
        cut = self.n_frames_done * self.frame_shift - self._samples_base
        if cut > 0:
            self.samples = self.samples[cut:]
            self._samples_base += cut

    def _extract_full_groups(self) -> None:
        n_avail = fbank_mod.num_frames(self.n_samples, self.frame_len,
                                       self.frame_shift)
        while True:
            todo = n_avail - self.n_frames_done
            if todo < self.FRAME_GROUP:
                break
            # largest power-of-2 bucket that fits the backlog (exactness
            # is unaffected: each frame reads only its own samples)
            g = self.FRAME_GROUP
            while g * 2 <= min(todo, self.MAX_GROUP_FRAMES):
                g *= 2
            s0 = self.n_frames_done * self.frame_shift - self._samples_base
            need = (g - 1) * self.frame_shift + self.frame_len
            fn = (self._fbank_group if g == self.FRAME_GROUP
                  else _get_fbank_group_fn(self.rate, self.mel, need))
            feats = np.asarray(fn(self.samples[s0: s0 + need]),
                               np.float32)
            self._ingest(feats)
            self.n_frames_done += g
        self._trim_samples()

    def flush_tail(self) -> None:
        """Extract the final sub-group frames (end of stream)."""
        nf = fbank_mod.num_frames(self.n_samples, self.frame_len,
                                  self.frame_shift)
        if nf <= self.n_frames_done:
            return
        s0 = self.n_frames_done * self.frame_shift - self._samples_base
        seg = self.samples[s0: s0 + self.group_samples]
        if len(seg) < self.group_samples:
            seg = np.concatenate(
                [seg, np.zeros((self.group_samples - len(seg),),
                               np.float32)])
        feats = np.asarray(self._fbank_group(seg),
                           np.float32)[: nf - self.n_frames_done]
        self._ingest(feats)
        self.n_frames_done = nf
        self._trim_samples()

    def t_total(self) -> int:
        """Subsampled (conv2d /4) output count of the frames so far."""
        return ((self.n_frames - 1) // 2 - 1) // 2

    def window(self, f0: int, n: int) -> np.ndarray:
        """Normalized feature window [<=n, mel] starting at ABSOLUTE
        frame f0 (short only at the end of the stream — caller pads).
        Consumers read monotonically increasing f0, so frames behind f0
        are trimmed here (long-stream memory bound).

        "running" stats cover exactly the frames [0, f0+n) — the frames
        the encoder is allowed to see at this chunk — NOT everything
        ingested so far: ingestion timing depends on audio arrival
        pattern (piece sizes, scheduler interleaving), and normalizing
        with whatever happened to be buffered made the SAME stream
        decode differently under different arrival patterns (caught by
        the round-3 serving runtime verify drive)."""
        if self.normalization == "running":
            # fold frames [self._nn, f0+n) into the running stats; the
            # fold point only moves forward (window ends are
            # monotonic: next f0' >= f0 and n is fixed), and folded
            # frames are never behind f0 (f0' - f0 <= n), so trimming
            # below never drops an unfolded frame
            end = min(f0 + n, self.n_frames)
            if end > self._nn:
                seg = self.frames[self._nn - self._frames_base:
                                  end - self._frames_base
                                  ].astype(np.float64)
                self._nsum += seg.sum(0)
                self._nsumsq += (seg ** 2).sum(0)
                self._nn = end
        cut = f0 - self._frames_base
        if cut > 0:
            self.frames = self.frames[cut:]
            self._frames_base = f0
        w = self.frames[f0 - self._frames_base: f0 - self._frames_base + n]
        if self.normalization != "running" or self._nn == 0:
            return w
        mean = (self._nsum / self._nn).astype(np.float32)
        var = (self._nsumsq / self._nn - (self._nsum / self._nn) ** 2)
        var = np.maximum(var, 0.0).astype(np.float32)
        return (w - mean) / np.sqrt(var + 1e-8)


def _get_step_fn(model: ASRModel):
    """One jitted chunk step per model (flax modules are hashable);
    sharing it across StreamingRecognizer instances keeps XLA's compile
    cache warm stream-to-stream."""
    fn = _STEP_CACHE.get(model)
    if fn is None:
        @jax.jit
        def fn(params, window, offset, k_caches, v_caches, cache_len,
               cnn_caches, valid_len):
            enc, k_new, v_new, c = model.apply(
                params, window, offset, k_caches, v_caches, cache_len,
                cnn_caches, valid_len, method=ASRModel.encode_chunk)
            logp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
            left = k_caches[0].shape[1]
            if left > 0:  # roll right-aligned histories inside the jit
                k_out = tuple(
                    jnp.concatenate([kc, kn], axis=1)[:, -left:]
                    for kc, kn in zip(k_caches, k_new))
                v_out = tuple(
                    jnp.concatenate([vc, vn], axis=1)[:, -left:]
                    for vc, vn in zip(v_caches, v_new))
            else:
                k_out, v_out = k_caches, v_caches
            return jnp.argmax(logp, axis=-1)[0], enc, k_out, v_out, c

        _STEP_CACHE[model] = fn
    return fn


class StreamingRecognizer:
    """Single-stream (B=1) online recognizer."""

    def __init__(self, model: ASRModel, params, *, chunk_size: int = 16,
                 num_left_chunks: int = 4, sample_rate: int = 16000,
                 num_mel_bins: int | None = None, blank_id: int = 0,
                 collect_encoder_out: bool = False,
                 normalization: str = "none",
                 endpoint_config: EndpointConfig | None = None):
        """normalization: how to normalize fbank frames before the
        encoder. "none" feeds raw log-mel — correct for models trained
        with global CMVN (the GlobalCMVN layer lives inside the encoder
        and encode_chunk applies it). "running" applies causal
        mean/variance normalization with statistics over all frames
        seen so far — the streamable approximation for models trained
        with PER-UTTERANCE normalization (the training frontend
        normalizes each utterance with its full-length statistics,
        which no online system can reproduce exactly; prefer global
        CMVN for production streaming, WeNet convention). Feeding raw
        features to a per-utterance-normalized model produces garbage —
        bin/stream_recognize selects the right mode from the training
        config automatically."""
        assert model.input_layer == "conv2d", \
            "streaming runtime currently supports conv2d subsampling"
        assert model.causal, "streaming needs a causal conv module"
        self.model = model
        # commit the weights to the device ONCE: checkpoint loading
        # yields host numpy leaves, and jit re-uploads numpy arguments
        # on EVERY call — per chunk step that is the whole parameter
        # set over the wire (~100 ms/step on the tunnel, and the axon
        # client retains each transfer: a 2k-utterance streamed drive
        # leaked 130 GB host RSS and was OOM-killed; docs/AXON_NOTES.md)
        self.params = jax.device_put(params)
        self.chunk = chunk_size
        # static shapes force a finite attention history; -1 ("full
        # left" in training masks) cannot mean unlimited here — demand
        # an explicit window instead of silently decoding with zero
        # context (exact for any utterance shorter than the window)
        assert num_left_chunks >= 0, (
            "streaming needs a finite left-context window; pass "
            "num_left_chunks >= ceil(max_utt_frames / chunk_size) to "
            "reproduce a full-left-context (num_left_chunks=-1) model "
            "exactly")
        self.left = num_left_chunks * chunk_size
        self.rate = sample_rate
        self.mel = num_mel_bins or model.input_size
        self.blank_id = blank_id
        self.frame_len = int(sample_rate * 0.025)
        self.frame_shift = int(sample_rate * 0.010)
        # feature window for `chunk` subsampled outputs: 4c+3 frames
        self.win_frames = 4 * chunk_size + 3
        n_apps = model.encoder_num_blocks
        h = model.attention_heads
        dk = model.d_model // h
        dt = model.compute_dtype
        self.k_caches = tuple(jnp.zeros((1, self.left, h, dk), dt)
                              for _ in range(n_apps))
        self.v_caches = tuple(jnp.zeros((1, self.left, h, dk), dt)
                              for _ in range(n_apps))
        self.cnn_caches = tuple(
            jnp.zeros((1, model.cnn_module_kernel - 1, model.d_model), dt)
            for _ in range(n_apps))
        self.cache_len = 0
        self.offset = 0          # absolute subsampled-frame position
        self.hyp: list[int] = []
        self.times: list[int] = []   # emission position of each hyp token
        self.prev_tok = -1
        self.finished = False
        # one encoder position = 4 feature frames x 10 ms
        self.frame_ms = 40.0
        self.endpointer = Endpointer(endpoint_config,
                                     frame_ms=self.frame_ms,
                                     blank_id=blank_id)
        # incremental fbank + running normalization live in the shared
        # host pipeline (also used per-slot by StreamingBatch)
        self.fe = HostFrontend(self.mel, self.rate, normalization)

        self._step = _get_step_fn(model)
        # optional encoder-output capture (tests); forces a device sync
        # per chunk, so it's off in production
        self.collect_encoder_out = collect_encoder_out
        self.enc_chunks: list[np.ndarray] = []

    # ---- audio in ----

    def accept_waveform(self, wav: np.ndarray) -> list[int]:
        """Feed float32 samples (x32768-scaled like training); returns the
        tokens newly emitted by the partial CTC hypothesis."""
        # Resuming after finish() would corrupt the hypothesis: the
        # flush chunk rolled zero-pad positions into the K/V caches and
        # cache_len counts them valid, so later chunks would attend to
        # padding. Streams are one-shot; start a new recognizer.
        assert not self.finished, \
            "accept_waveform() after finish(); streams are one-shot"
        self.fe.accept(wav)
        emitted = []
        while (self.fe.n_frames - self._consumed()
               >= self.win_frames):
            emitted += self._run_chunk()
        return emitted

    def _consumed(self) -> int:
        # feature frames consumed so far = 4 * offset (stride 4)
        return 4 * self.offset

    def _run_chunk(self, valid: int | None = None) -> list[int]:
        """One encoder chunk step. valid < chunk_size only on the final
        flush chunk: the feature window is zero-padded to the static
        shape and attention masks the padding (encoder valid_len);
        only the first `valid` CTC outputs are consumed."""
        valid = self.chunk if valid is None else valid
        f0 = self._consumed()
        window = self.fe.window(f0, self.win_frames)
        if window.shape[0] < self.win_frames:  # final flush chunk
            window = np.concatenate(
                [window, np.zeros((self.win_frames - window.shape[0],
                                   self.mel), np.float32)], axis=0)
        win = jnp.asarray(window)[None]
        toks, enc, k_out, v_out, cnn = self._step(
            self.params, win, jnp.asarray(self.offset, jnp.int32),
            self.k_caches, self.v_caches,
            jnp.asarray(self.cache_len, jnp.int32), self.cnn_caches,
            jnp.asarray(valid, jnp.int32))
        if self.collect_encoder_out:
            self.enc_chunks.append(np.asarray(enc[0])[:valid])
        if self.left > 0:
            self.k_caches, self.v_caches = k_out, v_out
            self.cache_len = min(self.cache_len + self.chunk, self.left)
        self.cnn_caches = cnn
        pos0 = self.offset
        self.offset += self.chunk
        out = []
        frame_toks = np.asarray(toks).tolist()[:valid]
        for i, t in enumerate(frame_toks):
            if t != self.prev_tok and t != self.blank_id:
                out.append(int(t))
                self.times.append(pos0 + i)
            self.prev_tok = t
        self.endpointer.feed(frame_toks)
        self.hyp += out
        return out

    def finish(self) -> list[int]:
        """End-of-stream flush. Without it the tail of every utterance
        is silently dropped: frames short of a full extraction group
        and subsampled outputs short of a full chunk (up to
        chunk_size*40ms + 160ms of audio) never reach the encoder —
        found as systematic suffix truncation in the recipe drive.

        Exact by construction: the flushed fbank frames each depend
        only on their own 400 real samples (the group segment is
        zero-padded but over-count frames are discarded), and the final
        partial chunk masks its padding via the encoder's valid_len, so
        every emitted output attends only to real positions. Returns
        the newly emitted tokens."""
        if self.finished:  # idempotent: second flush emits nothing
            return []
        self.finished = True
        self.fe.flush_tail()
        t_total = self.fe.t_total()
        out = []
        while t_total - self.offset > self.chunk:
            out += self._run_chunk()
        if t_total > self.offset:
            out += self._run_chunk(valid=t_total - self.offset)
        return out

    def result(self) -> list[int]:
        return list(self.hyp)

    def result_times_ms(self) -> list[float]:
        """Emission time (onset, ms) of each token in result() —
        greedy-path CTC timestamps at 40 ms granularity."""
        return [p * self.frame_ms for p in self.times]

    def endpoint_detected(self) -> bool:
        """Trailing-silence endpoint decision over the greedy path
        (decode/endpoint.py rules); latches True once triggered."""
        return self.endpointer.detected
