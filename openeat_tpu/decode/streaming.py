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
        @jax.jit
        def fn(seg):
            feats, _ = fbank_mod.fbank(
                seg[None], jnp.array([group_samples]),
                sample_rate=rate, num_mel_bins=mel)
            return feats[0]

        _FBANK_CACHE[key] = fn
    return fn


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
                 normalization: str = "none"):
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
        self.params = params
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
        self.samples = np.zeros((0,), np.float32)
        self.frames = np.zeros((0, self.mel), np.float32)
        self.n_frames_done = 0   # fbank frames computed so far
        self.hyp: list[int] = []
        self.prev_tok = -1
        self.finished = False
        assert normalization in ("none", "running"), normalization
        self.normalization = normalization
        self._nsum = np.zeros((self.mel,), np.float64)
        self._nsumsq = np.zeros((self.mel,), np.float64)
        self._nn = 0

        self._step = _get_step_fn(model)
        # optional encoder-output capture (tests); forces a device sync
        # per chunk, so it's off in production
        self.collect_encoder_out = collect_encoder_out
        self.enc_chunks: list[np.ndarray] = []
        # incremental fbank: fixed groups of frames -> one compiled shape
        self.frame_group = 16
        group_samples = ((self.frame_group - 1) * self.frame_shift
                         + self.frame_len)
        self._fbank_group = _get_fbank_group_fn(self.rate, self.mel,
                                                group_samples)
        self._group_samples = group_samples

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
        self.samples = np.concatenate([self.samples,
                                       np.asarray(wav, np.float32)])
        self._extract_frames()
        emitted = []
        while self.frames.shape[0] - self._consumed() >= self.win_frames:
            emitted += self._run_chunk()
        return emitted

    def _consumed(self) -> int:
        # feature frames consumed so far = 4 * offset (stride 4)
        return 4 * self.offset

    def _extract_frames(self):
        """Compute new fbank frames in fixed-size groups (each frame
        depends only on its own 400-sample window, so grouping is exact
        and every group compiles to the same XLA program)."""
        n_avail = fbank_mod.num_frames(len(self.samples), self.frame_len,
                                       self.frame_shift)
        while n_avail - self.n_frames_done >= self.frame_group:
            s0 = self.n_frames_done * self.frame_shift
            seg = self.samples[s0: s0 + self._group_samples]
            feats = self._fbank_group(jnp.asarray(seg))
            feats = np.asarray(feats, np.float32)
            if self.normalization == "running":
                self._nsum += feats.sum(0)
                self._nsumsq += (feats.astype(np.float64) ** 2).sum(0)
                self._nn += feats.shape[0]
            self.frames = np.concatenate([self.frames, feats], axis=0)
            self.n_frames_done += self.frame_group

    def _normalize(self, window: np.ndarray) -> np.ndarray:
        """Causal running mean/var normalization (matches the training
        frontend's per-utt formula, specaug.per_utt_normalize, but with
        frames-so-far statistics — the streamable approximation)."""
        if self.normalization != "running" or self._nn == 0:
            return window
        mean = (self._nsum / self._nn).astype(np.float32)
        var = (self._nsumsq / self._nn - (self._nsum / self._nn) ** 2)
        var = np.maximum(var, 0.0).astype(np.float32)
        return (window - mean) / np.sqrt(var + 1e-8)

    def _run_chunk(self, valid: int | None = None) -> list[int]:
        """One encoder chunk step. valid < chunk_size only on the final
        flush chunk: the feature window is zero-padded to the static
        shape and attention masks the padding (encoder valid_len);
        only the first `valid` CTC outputs are consumed."""
        valid = self.chunk if valid is None else valid
        f0 = self._consumed()
        window = self._normalize(self.frames[f0: f0 + self.win_frames])
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
        self.offset += self.chunk
        out = []
        for t in np.asarray(toks).tolist()[:valid]:
            if t != self.prev_tok and t != self.blank_id:
                out.append(int(t))
            self.prev_tok = t
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
        nf = fbank_mod.num_frames(len(self.samples), self.frame_len,
                                  self.frame_shift)
        if nf > self.n_frames_done:
            s0 = self.n_frames_done * self.frame_shift
            seg = self.samples[s0: s0 + self._group_samples]
            if len(seg) < self._group_samples:
                seg = np.concatenate(
                    [seg, np.zeros((self._group_samples - len(seg),),
                                   np.float32)])
            feats = np.asarray(self._fbank_group(jnp.asarray(seg)),
                               np.float32)[: nf - self.n_frames_done]
            if self.normalization == "running":
                self._nsum += feats.sum(0)
                self._nsumsq += (feats.astype(np.float64) ** 2).sum(0)
                self._nn += feats.shape[0]
            self.frames = np.concatenate([self.frames, feats], axis=0)
            self.n_frames_done = nf
        t_total = ((self.frames.shape[0] - 1) // 2 - 1) // 2
        out = []
        while t_total - self.offset > self.chunk:
            out += self._run_chunk()
        if t_total > self.offset:
            out += self._run_chunk(valid=t_total - self.offset)
        return out

    def result(self) -> list[int]:
        return list(self.hyp)
