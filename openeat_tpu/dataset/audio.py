"""Host-side audio IO: WAV reading, segment slicing, resampling, speed
perturbation.

Replaces the reference's torchaudio/libsox stack (reference
openeat/dataset/dataset.py:57-91: sox_io load + segment slice + x32768
scaling + Resample; openeat/dataset/audio_processor.py:5-35: sox
speed+rate effects) with a first-party numpy WAV reader (PCM 8/16/24/32
and float32) plus scipy polyphase resampling. When the native C++ loader
(openeat_tpu.runtime) is built, it takes over file IO; this module is the
always-available pure-Python path with identical semantics.

Speed perturb parity: sox `speed s` + `rate r` resamples the waveform by
s and reinterprets at the original rate — duration scales by 1/s. For
the recipe's rational speeds (0.9, 1.0, 1.1) this is an exact polyphase
resample_poly(up=10, down=9|11).
"""

from __future__ import annotations

import struct
import wave
from fractions import Fraction

import numpy as np
from scipy import signal as sps


def read_wav(path: str, start_s: float | None = None,
             end_s: float | None = None) -> tuple[np.ndarray, int]:
    """Read (mono-ized) PCM/float WAV -> (float32 in [-1,1], sample_rate).

    Segment [start_s, end_s) slicing matches the reference's
    frame_offset/num_frames load (dataset.py:64-70).
    """
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
            elif cid == b"data":
                data = f.read(size)
            else:
                f.seek(size + (size & 1), 1)
            if fmt is not None and data is not None:
                break
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(data, "u1").astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, "u1").reshape(-1, 3)
            x = ((raw[:, 0].astype(np.int32))
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x)
            x = x.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"{path}: unsupported PCM bits={bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported format {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if start_s is not None or end_s is not None:
        s = int((start_s or 0.0) * rate)
        e = int(end_s * rate) if end_s is not None else len(x)
        x = x[s:e]
    return np.ascontiguousarray(x), rate


def read_audio(path: str, start_s: float | None = None,
               end_s: float | None = None) -> tuple[np.ndarray, int]:
    """Format-dispatched read: RIFF/WAVE or FLAC by magic bytes.

    Replaces the reference's sox any-format load
    (reference dataset.py:62-72) for the two formats ASR corpora
    actually ship in (AIShell: WAV, LibriSpeech: FLAC)."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from openeat_tpu.dataset.flac import read_flac
        return read_flac(path, start_s, end_s)
    return read_wav(path, start_s, end_s)


def write_wav(path: str, x: np.ndarray, rate: int) -> None:
    """Write mono float32 [-1,1] as 16-bit PCM (test fixtures, tools)."""
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def resample(x: np.ndarray, orig_rate: int, new_rate: int) -> np.ndarray:
    """Polyphase rate conversion (reference dataset.py:81-84 semantics)."""
    if orig_rate == new_rate:
        return x
    frac = Fraction(new_rate, orig_rate).limit_denominator(1000)
    return sps.resample_poly(x, frac.numerator, frac.denominator).astype(
        np.float32)


def speed_perturb(x: np.ndarray, rate: int, speed: float) -> np.ndarray:
    """sox speed effect: resample by `speed`, keep the nominal rate.

    Parity: reference audio_processor.py:19-35 (sox 'speed' + 'rate').
    Output duration = len(x) / speed.
    """
    if speed == 1.0:
        return x
    frac = Fraction(speed).limit_denominator(100)
    # playback speed s <=> resample from rate to rate/s then relabel
    return sps.resample_poly(x, frac.denominator, frac.numerator).astype(
        np.float32)


def random_speed(speeds=(0.9, 1.1, 0.1), rng: np.random.Generator | None
                 = None) -> float:
    """Draw a speed from [lo, hi] at `step` granularity
    (reference audio_processor.py:5-18)."""
    rng = rng or np.random.default_rng()
    lo, hi, step = speeds
    choices = np.arange(lo, hi + step / 2, step)
    return float(rng.choice(choices))
