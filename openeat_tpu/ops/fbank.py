"""Kaldi-compatible log-mel filterbank frontend, fully on-device.

Replaces the reference's host-side `torchaudio.compliance.kaldi.fbank`
call (reference openeat/dataset/dataset.py:93-100: 25 ms / 10 ms frames,
dither, `mel_bins`, energy_floor 0) with a single jitted batched device
function: dither -> framing -> DC removal -> preemphasis (0.97) -> povey
window -> rFFT(next pow2) -> power spectrum -> mel filterbank matmul
(MXU) -> log. Numerics follow the kaldi conventions exactly
(snip_edges=True, round_to_power_of_two=True, remove_dc_offset=True,
use_power=True, low_freq=20, high_freq=nyquist, window^0.85 povey).

The per-frame ops are elementwise over a [B, T, 400] frame tensor and the
mel projection is one [B*T, 257] x [257, 80] matmul, so XLA fuses the
whole frontend into a handful of kernels with the FLOPs on the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

MEL_BREAK_FREQ = 700.0
MEL_HIGH_FREQ_Q = 1127.0
EPS = float(np.finfo(np.float32).eps)


def mel_scale(freq):
    return MEL_HIGH_FREQ_Q * np.log(1.0 + freq / MEL_BREAK_FREQ)


def num_frames(num_samples, frame_len: int, frame_shift: int):
    """snip_edges=True frame count: 1 + floor((N - len) / shift), min 0."""
    n = (num_samples - frame_len) // frame_shift + 1
    if isinstance(n, (int, np.integer)):
        return max(int(n), 0)
    return jnp.maximum(n, 0)


@functools.lru_cache(maxsize=8)
def mel_banks(num_bins: int, window_size_padded: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """[num_fft_bins+1, num_bins] triangular mel weights (kaldi layout).

    num_fft_bins = window_size_padded // 2; the final (nyquist) row is
    zero, matching kaldi's convention of ignoring the nyquist bin.
    """
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist
    num_fft_bins = window_size_padded // 2
    fft_bin_width = sample_freq / window_size_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins, dtype=np.float64)
    left = mel_low + bins * mel_delta           # [num_bins]
    center = mel_low + (bins + 1.0) * mel_delta
    right = mel_low + (bins + 2.0) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mels = mel_scale(freqs)[:, None]            # [num_fft_bins, 1]
    up = (mels - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - mels) / (right - center)[None, :]
    w = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_fft_bins + 1, num_bins), dtype=np.float32)
    out[:num_fft_bins] = w
    return out


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=8)
def dft_basis(frame_len: int, padded: int) -> np.ndarray:
    """[frame_len, 2*(padded//2+1)] real-DFT basis (cos block, then
    -sin block), so power = (f@C)^2 + (f@S)^2 for a zero-padded rFFT.

    Rationale: XLA's FFT on TPU runs on the VPU via a generic
    decomposition; expressing the 512-point rFFT of 400-sample frames
    as ONE [B*T, 400] x [400, 514] f32 matmul puts the frontend's only
    heavy op on the MXU (the zero-padded tail contributes nothing, so
    the basis needs only frame_len rows). ~33 GFLOP at the flagship
    batch — sub-ms, vs ~6-10 ms of in-step FFT time
    (benchmarks/results/r4_step_diag/step_ablation.log: frontend 11.8).
    """
    n = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(padded // 2 + 1, dtype=np.float64)[None, :]
    theta = 2.0 * math.pi * n * k / padded
    return np.concatenate([np.cos(theta), -np.sin(theta)],
                          axis=1).astype(np.float32)


@functools.lru_cache(maxsize=8)
def composed_conv_basis(frame_len: int, padded: int, preemphasis: float,
                        remove_dc_offset: bool) -> np.ndarray:
    """[frame_len, 1, 2*(padded//2+1)] strided-conv kernel folding the
    ENTIRE per-frame pre-DFT chain into the DFT basis.

    DC removal (x - mean), preemphasis (x_i - a*x_{i-1}, kaldi's
    x_0 - a*x_0 first-sample rule) and the povey window are all LINEAR
    maps of the 400-sample frame, so frame_out = D @ P @ C @ x and
    spec = basis^T frame_out = (C^T P^T D basis)^T x — one matrix,
    composed here in float64. Applying it as a stride-`frame_shift`
    VALID conv over the raw waveform computes framing + dc + preemph +
    window + rDFT in ONE MXU op with no [B, T, 400] frames tensor
    (the materialized-frames path measured 10.4 ms on the flagship
    batch; the conv path replaces everything before the power spectrum).

    Documented deviation: DC cancellation happens between f32
    coefficient products instead of in data space, so a constant
    NONZERO frame floors at ~-80 dB relative to its DC power rather
    than at exactly log(EPS) (all-zero silence still floors exactly).
    On real signals this path is ~10x CLOSER to the float64 oracle
    than the frames path (2.9e-6 vs 7.8e-5 max abs log-mel error),
    because the frame transform is composed in float64.
    """
    lcm = frame_len
    c = np.eye(lcm, dtype=np.float64)
    if remove_dc_offset:
        c = c - 1.0 / lcm
    if preemphasis != 0.0:
        p = np.eye(lcm, dtype=np.float64)
        p[0, 0] = 1.0 - preemphasis
        idx = np.arange(1, lcm)
        p[idx, idx - 1] = -preemphasis
        c = p @ c
    win_n = np.arange(lcm, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2.0 * math.pi * win_n /
                                (lcm - 1))) ** 0.85
    c = povey[:, None] * c
    n = np.arange(lcm, dtype=np.float64)[:, None]
    k = np.arange(padded // 2 + 1, dtype=np.float64)[None, :]
    theta = 2.0 * math.pi * n * k / padded
    basis = np.concatenate([np.cos(theta), -np.sin(theta)], axis=1)
    comp = c.T @ basis                      # [L, 2K]
    return comp.astype(np.float32)[:, None, :]   # WIO layout


def frame_signal(wav: jax.Array, frame_len: int, frame_shift: int,
                 max_frames: int) -> jax.Array:
    """[B, N] -> [B, max_frames, frame_len] overlapping frames.

    TPU note: the obvious 2-D gather (`wav[:, starts+offsets]`) lowers
    to a per-element gather that measured 3.5 TF/s-bucket slow — ~8 ms
    of the 10.4 ms flagship frontend (r4_step_diag/step_ablation2.log).
    Instead the wav is viewed as g-sample blocks (g = gcd(len, shift));
    every frame is then `frame_len/g` CONSECUTIVE blocks starting at
    block `t*shift/g`, so framing becomes a reshape + nblk strided
    slices + one concat — plain vectorized copies, no gather. Kaldi's
    25 ms/10 ms frames give g=80, 5 slices of stride 2.

    Frames past the signal tail (possible only when callers over-size
    max_frames) read zero-padding; callers mask them via
    :func:`num_frames` arithmetic.
    """
    b, n = wav.shape
    g = math.gcd(frame_len, frame_shift)
    if g >= 8:
        step = frame_shift // g   # blocks per frame hop
        nblk = frame_len // g     # blocks per frame
        need = ((max_frames - 1) * step + nblk) * g  # last block end
        if need > n:
            wav = jnp.pad(wav, ((0, 0), (0, need - n)))
        pad = (-wav.shape[1]) % g
        if pad:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        blocks = wav.reshape(b, -1, g)
        parts = [blocks[:, j::step][:, :max_frames]
                 for j in range(nblk)]
        return jnp.concatenate(parts, axis=-1)
    starts = jnp.arange(max_frames) * frame_shift            # [T]
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]   # [T, L]
    idx = jnp.minimum(idx, n - 1)
    return wav[:, idx]


def fbank(
    wav: jax.Array,
    wav_lens: jax.Array,
    *,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    dither: float = 0.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    rng: jax.Array | None = None,
    fft_impl: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Batched kaldi fbank. wav: [B, N] float32 (already x32768 scaled),
    wav_lens: [B] sample counts. Returns (feats [B, T, M] f32, flens [B]).

    T is the static frame capacity for N samples; frames past flens[b]
    contain garbage and must be masked downstream (standard static-shape
    TPU convention).

    int16 input (the preferred host->device transfer dtype, see
    AudioCollate.wav_dtype) is cast to f32 here; the cast fuses into
    the framing/preemphasis elementwise group under jit.
    """
    wav = wav.astype(jnp.float32)
    b, n = wav.shape
    frame_len = int(sample_rate * frame_length_ms / 1000.0)
    frame_shift = int(sample_rate * frame_shift_ms / 1000.0)
    t = num_frames(n, frame_len, frame_shift)
    if t <= 0:
        raise ValueError(f"waveform too short: {n} samples < {frame_len}")
    padded = next_pow2(frame_len)
    nb = padded // 2 + 1

    if fft_impl == "auto":
        # the composed-conv path is exact only when no per-frame-sample
        # dither is injected (kaldi dithers AFTER framing; overlapping
        # frames draw independent noise — a linear pre-framing map can't
        # express that)
        fft_impl = "conv" if dither == 0.0 else "matmul"

    if fft_impl == "conv":
        if dither != 0.0:
            # kaldi dithers AFTER framing (independent noise per frame
            # sample, including the overlap region) — a linear
            # pre-framing map cannot express that, so an explicit
            # fft_impl='conv' with dither would silently change
            # training-time feature statistics (ADVICE r4).
            raise ValueError(
                "fft_impl='conv' cannot apply dither; use fft_impl="
                "'matmul' (or 'auto', which routes dithered calls there)")
        comp = jnp.asarray(composed_conv_basis(
            frame_len, padded, preemphasis, remove_dc_offset))
        need = (t - 1) * frame_shift + frame_len
        spec_ri = jax.lax.conv_general_dilated(
            wav[:, :need, None], comp, (frame_shift,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))   # [B, T, 2K]
        power = spec_ri[..., :nb] ** 2 + spec_ri[..., nb:] ** 2
        mel = jnp.asarray(mel_banks(num_mel_bins, padded,
                                    float(sample_rate)))
        energies = jnp.einsum("btf,fm->btm", power, mel,
                              preferred_element_type=jnp.float32)
        feats = jnp.log(jnp.maximum(energies, EPS))
        flens = num_frames(wav_lens.astype(jnp.int32), frame_len,
                           frame_shift)
        return feats.astype(jnp.float32), flens

    frames = frame_signal(wav, frame_len, frame_shift, t)  # [B,T,L]
    if dither != 0.0:
        if rng is None:
            raise ValueError("dither requires an rng key")
        frames = frames + dither * jax.random.normal(rng, frames.shape,
                                                     frames.dtype)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    # povey window: hann^0.85
    win_n = np.arange(frame_len, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2.0 * math.pi * win_n / (frame_len - 1))) ** 0.85
    frames = frames * jnp.asarray(povey, frames.dtype)

    if fft_impl == "matmul":
        # rFFT as one MXU matmul (see dft_basis); numerically within
        # f32 rounding of jnp.fft.rfft (both accumulate ~400 f32 terms)
        basis = jnp.asarray(dft_basis(frame_len, padded))
        spec_ri = jnp.einsum("btl,lk->btk", frames, basis,
                             preferred_element_type=jnp.float32)
        nb = padded // 2 + 1
        power = spec_ri[..., :nb] ** 2 + spec_ri[..., nb:] ** 2
    else:
        pad = padded - frame_len
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
        spec = jnp.fft.rfft(frames, n=padded, axis=-1)      # [B,T,padded/2+1]
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.asarray(mel_banks(num_mel_bins, padded, float(sample_rate)))
    # MXU: [B*T, F] @ [F, M]
    energies = jnp.einsum("btf,fm->btm", power, mel,
                          preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(energies, EPS))

    flens = num_frames(wav_lens.astype(jnp.int32), frame_len, frame_shift)
    return feats.astype(jnp.float32), flens


def fbank_numpy_reference(wav: np.ndarray, *, sample_rate: int = 16000,
                          num_mel_bins: int = 80,
                          frame_length_ms: float = 25.0,
                          frame_shift_ms: float = 10.0,
                          preemphasis: float = 0.97,
                          remove_dc_offset: bool = True) -> np.ndarray:
    """Trusted single-utterance numpy implementation of kaldi fbank
    (dither off), used as the ground-truth oracle in tests."""
    frame_len = int(sample_rate * frame_length_ms / 1000.0)
    frame_shift = int(sample_rate * frame_shift_ms / 1000.0)
    t = num_frames(len(wav), frame_len, frame_shift)
    padded = next_pow2(frame_len)
    win_n = np.arange(frame_len, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2.0 * math.pi * win_n / (frame_len - 1))) ** 0.85
    mel = mel_banks(num_mel_bins, padded, float(sample_rate)).astype(np.float64)
    out = np.zeros((t, num_mel_bins), dtype=np.float64)
    for i in range(t):
        fr = wav[i * frame_shift: i * frame_shift + frame_len].astype(np.float64)
        if remove_dc_offset:
            fr = fr - fr.mean()
        if preemphasis != 0.0:
            prev = np.concatenate([fr[:1], fr[:-1]])
            fr = fr - preemphasis * prev
        fr = fr * povey
        spec = np.fft.rfft(fr, n=padded)
        power = spec.real ** 2 + spec.imag ** 2
        out[i] = np.log(np.maximum(power @ mel, EPS))
    return out.astype(np.float32)
