"""Audio transforms (parity: reference data/transforms/audio.py:539 — resample,
noise, gain, roll, MFCC, set_fixed_length — and audio_bytes.py:157).

Numpy implementations (host tier); MFCC uses an FFT filterbank pipeline equivalent
to torchaudio's defaults."""

from __future__ import annotations

import argparse
import random
from typing import Dict

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation


@TRANSFORMATIONS_REGISTRY.register(name="audio-resample", type="audio")
class AudioResample(BaseTransformation):
    """Linear-interpolation resample to a target rate (reference audio.py:414
    ``audio-resample``; sox is replaced by numpy interp — no torchaudio in the
    TPU pipeline)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.target_rate = getattr(
            opts, "audio_augmentation.audio_resample.audio_fps", None) or getattr(
            opts, "audio_augmentation.audio_resample.sample_rate", 16000)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.audio-resample.enable",
                           action="store_true", default=False)
        # reference flag name (audio.py:421)
        group.add_argument("--audio-augmentation.audio-resample.audio-fps",
                           type=int, default=None)
        group.add_argument("--audio-augmentation.audio-resample.sample-rate",
                           type=int, default=16000)
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = np.asarray(data["audio"], np.float32)
        rate = data.get("metadata", {}).get("audio_fps", self.target_rate)
        if rate != self.target_rate:
            n_out = int(round(len(audio) * self.target_rate / rate))
            x_old = np.linspace(0, 1, len(audio))
            x_new = np.linspace(0, 1, n_out)
            audio = np.interp(x_new, x_old, audio).astype(np.float32)
            data.setdefault("metadata", {})["audio_fps"] = self.target_rate
        data["audio"] = audio
        return data


@TRANSFORMATIONS_REGISTRY.register(name="audio_ambient_noise", type="audio")
class AudioNoise(BaseTransformation):
    """Ambient-noise mix-in (reference audio.py:64 ``audio_ambient_noise``).

    With ``noise_files_dir`` (e.g. Speech Commands' ``_background_noise_``), a
    cached random noise wave is cropped/circular-padded to the sample length and
    added at a random dB level from ``--audio-augmentation.noise.levels``. Without
    a directory, falls back to white noise at a random SNR from the snr-low/high
    range (TPU-native extension; the reference requires noise files)."""

    def __init__(self, opts, noise_files_dir: str = None, **kwargs) -> None:
        super().__init__(opts)
        self.snr_low = getattr(opts, "audio_augmentation.noise.snr_low", 10)
        self.snr_high = getattr(opts, "audio_augmentation.noise.snr_high", 30)
        self.gain_levels = getattr(opts, "audio_augmentation.noise.levels",
                                   None) or [-100]
        self.cache_size = getattr(opts, "audio_augmentation.noise.cache_size", 10)
        self.refresh_freq = getattr(opts, "audio_augmentation.noise.refresh_freq", 0)
        self.refresh_counter = self.refresh_freq
        self.noise_files_dir = noise_files_dir or getattr(
            opts, "audio_augmentation.noise.files_dir", None)
        self.noise_waves = (self._load_noise_files(self.cache_size)
                            if self.noise_files_dir else [])

    def _load_noise_files(self, n: int):
        import os
        import wave as wave_mod

        paths = [os.path.join(self.noise_files_dir, f)
                 for f in sorted(os.listdir(self.noise_files_dir))
                 if f.endswith(".wav")]
        waves = []
        for p in random.sample(paths, min(n, len(paths))) if paths else []:
            with wave_mod.open(p, "rb") as w:
                audio = np.frombuffer(w.readframes(w.getnframes()),
                                      np.int16).astype(np.float32) / 32768.0
                waves.append((audio, float(w.getframerate())))
        return waves

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.noise.enable",
                           action="store_true", default=False)
        # reference flags (audio.py:118-152)
        group.add_argument("--audio-augmentation.noise.levels", type=float,
                           nargs="+", default=[-100])
        group.add_argument("--audio-augmentation.noise.cache-size", type=int,
                           default=10)
        group.add_argument("--audio-augmentation.noise.files-dir", type=str,
                           default=None)
        group.add_argument("--audio-augmentation.noise.refresh-freq", type=int,
                           default=0)
        # white-noise fallback range (TPU-native extension)
        group.add_argument("--audio-augmentation.noise.snr-low", type=float,
                           default=10)
        group.add_argument("--audio-augmentation.noise.snr-high", type=float,
                           default=30)
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = np.asarray(data["audio"], np.float32)
        if self.noise_waves:
            gain_level = random.choice(self.gain_levels)
            noise_wave, _fps = random.choice(self.noise_waves)
            n = audio.shape[-1]
            if noise_wave.shape[-1] >= n:
                start = random.randint(0, noise_wave.shape[-1] - n)
                noise_wave = noise_wave[start:start + n]
            else:  # circular pad to the sample length (reference audio.py:181)
                reps = -(-n // noise_wave.shape[-1])
                noise_wave = np.tile(noise_wave, reps)[:n]
            data["audio"] = audio + 10.0 ** (gain_level / 20.0) * noise_wave
            self.refresh_counter -= 1
            if self.refresh_counter <= 0 and self.refresh_freq > 0:
                self.noise_waves = self._load_noise_files(self.cache_size)
                self.refresh_counter = self.refresh_freq
            return data
        snr_db = random.uniform(self.snr_low, self.snr_high)
        sig_power = np.mean(audio**2) + 1e-10
        noise_power = sig_power / (10 ** (snr_db / 10))
        data["audio"] = audio + np.random.randn(*audio.shape).astype(np.float32) \
            * np.sqrt(noise_power)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="audio_gain", type="audio")
class AudioGain(BaseTransformation):
    """Scale by a random dB level from ``--audio-augmentation.gain.levels``
    (reference audio.py:19); falls back to a uniform db-low/high range when no
    levels are given."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.levels = getattr(opts, "audio_augmentation.gain.levels", None)
        self.low = getattr(opts, "audio_augmentation.gain.db_low", -10.0)
        self.high = getattr(opts, "audio_augmentation.gain.db_high", 10.0)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.gain.enable",
                           action="store_true", default=False)
        # reference flag (audio.py:33): discrete dB levels, one chosen per sample
        group.add_argument("--audio-augmentation.gain.levels", type=float,
                           nargs="+", default=None)
        group.add_argument("--audio-augmentation.gain.db-low", type=float,
                           default=-10.0)
        group.add_argument("--audio-augmentation.gain.db-high", type=float,
                           default=10.0)
        return parser

    def __call__(self, data: Dict) -> Dict:
        db = (random.choice(self.levels) if self.levels
              else random.uniform(self.low, self.high))
        data["audio"] = np.asarray(data["audio"], np.float32) * (10 ** (db / 20))
        return data


@TRANSFORMATIONS_REGISTRY.register(name="roll", type="audio")
class AudioRoll(BaseTransformation):
    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.window = getattr(opts, "audio_augmentation.roll.window", 0.1)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.roll.enable",
                           action="store_true", default=False)
        group.add_argument("--audio-augmentation.roll.window", type=float,
                           default=0.1)
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = np.asarray(data["audio"])
        shift = random.randint(-int(len(audio) * self.window),
                               int(len(audio) * self.window))
        data["audio"] = np.roll(audio, shift)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="set_fixed_length", type="audio")
class SetFixedLength(BaseTransformation):
    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.length = getattr(opts, "audio_augmentation.set_fixed_length.length",
                              16000)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.set-fixed-length.enable",
                           action="store_true", default=False)
        group.add_argument("--audio-augmentation.set-fixed-length.length",
                           type=int, default=16000)
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = np.asarray(data["audio"], np.float32)
        if len(audio) >= self.length:
            data["audio"] = audio[: self.length]
        else:
            data["audio"] = np.pad(audio, (0, self.length - len(audio)))
        return data


def _mel_filterbank(n_mels: int, n_fft: int, sample_rate: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(0), hz_to_mel(sample_rate / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(1, n_mels + 1):
        l, c, r = bins[i - 1], bins[i], bins[i + 1]
        for k in range(l, c):
            if c > l:
                fb[i - 1, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r > c:
                fb[i - 1, k] = (r - k) / (r - c)
    return fb


@TRANSFORMATIONS_REGISTRY.register(name="mfccs", type="audio")
class MFCCs(BaseTransformation):
    """Audio → MFCC feature image (reference audio.py:173)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.n_mfcc = getattr(opts, "audio_augmentation.mfccs.num_mfccs", 40)
        self.n_fft = getattr(opts, "audio_augmentation.mfccs.n_fft", 400)
        # reference parametrization (audio.py:344): window length in seconds →
        # n_fft = window_length * sample_rate (resolved per-sample in __call__)
        self.window_length = getattr(
            opts, "audio_augmentation.mfccs.window_length", None)
        self.num_frames = getattr(
            opts, "audio_augmentation.mfccs.num_frames", None)
        self.hop = getattr(opts, "audio_augmentation.mfccs.hop_length", 160)
        self.n_mels = max(self.n_mfcc, 64)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--audio-augmentation.mfccs.enable",
                           action="store_true", default=False)
        group.add_argument("--audio-augmentation.mfccs.num-mfccs", type=int,
                           default=40)
        group.add_argument("--audio-augmentation.mfccs.n-fft", type=int, default=400)
        group.add_argument("--audio-augmentation.mfccs.hop-length", type=int,
                           default=160)
        # reference flags (audio.py:344-352)
        group.add_argument("--audio-augmentation.mfccs.window-length",
                           type=float, default=None,
                           help="Window length in seconds; overrides n-fft")
        group.add_argument("--audio-augmentation.mfccs.num-frames", type=int,
                           default=None,
                           help="Config-compat (reference splits the "
                                "spectrogram into this many frame groups)")
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = np.asarray(data["audio"], np.float32)
        rate = data.get("metadata", {}).get("audio_fps", 16000)
        n_fft = self.n_fft
        if self.window_length:  # reference seconds-based parametrization
            n_fft = max(2, int(round(self.window_length * rate)))
        n_frames = max(1, 1 + (len(audio) - n_fft) // self.hop)
        window = np.hanning(n_fft)
        frames = np.stack([
            audio[i * self.hop: i * self.hop + n_fft] * window
            for i in range(n_frames)
        ])
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        fb = _mel_filterbank(self.n_mels, n_fft, rate)
        mel = np.log(spec @ fb.T + 1e-10)
        # DCT-II over mel axis
        n = mel.shape[-1]
        dct = np.cos(np.pi / n * (np.arange(n)[:, None] + 0.5)
                     * np.arange(self.n_mfcc)[None, :])
        data["audio"] = (mel @ dct).astype(np.float32)  # (frames, n_mfcc)
        return data
