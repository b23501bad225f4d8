"""Audio transform + Speech Commands dataset tests (reference
data/transforms/audio.py, data/datasets/audio_classification/speech_commands_v2.py).

WAV fixtures are synthesized with the stdlib ``wave`` module — no torchaudio.
"""

import os
import wave

import numpy as np
import pytest

from cvnets_tpu.options.opts import get_training_arguments


def _opts(extra=None):
    return get_training_arguments(args=[
        "--dataset.category", "audio_classification",
    ] + (extra or []))


def _write_wav(path, audio_f32, rate=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(audio_f32, -1, 1) * 32767).astype("<i2").tobytes())


def test_gain_levels_random_choice():
    from cvnets_tpu.data.transforms.audio import AudioGain

    opts = _opts(["--audio-augmentation.gain.levels", "-20"])
    g = AudioGain(opts)
    audio = np.ones(100, np.float32)
    out = g({"audio": audio})["audio"]
    assert np.allclose(out, 10 ** (-20 / 20.0), atol=1e-6)


def test_ambient_noise_from_files(tmp_path):
    from cvnets_tpu.data.transforms.audio import AudioNoise

    noise_dir = tmp_path / "bg"
    noise_dir.mkdir()
    # one short noise file (circular-pad path) and one long (crop path)
    _write_wav(str(noise_dir / "short.wav"), np.full(50, 0.5, np.float32))
    _write_wav(str(noise_dir / "long.wav"), np.full(500, 0.5, np.float32))
    opts = _opts(["--audio-augmentation.noise.levels", "0"])
    t = AudioNoise(opts, noise_files_dir=str(noise_dir))
    assert len(t.noise_waves) == 2
    audio = np.zeros(200, np.float32)
    out = t({"audio": audio})["audio"]
    # level 0 dB → noise added at unit gain; both fixtures are ~0.5 everywhere
    assert out.shape == (200,)
    assert np.all(np.abs(out - 0.5) < 0.01)


def test_ambient_noise_white_fallback_without_dir():
    from cvnets_tpu.data.transforms.audio import AudioNoise

    opts = _opts()
    t = AudioNoise(opts)
    audio = np.sin(np.linspace(0, 20, 400)).astype(np.float32)
    out = t({"audio": audio})["audio"]
    assert out.shape == audio.shape
    assert not np.allclose(out, audio)


def test_set_fixed_length_and_roll():
    from cvnets_tpu.data.transforms.audio import AudioRoll, SetFixedLength

    opts = _opts(["--audio-augmentation.set-fixed-length.length", "64"])
    sfl = SetFixedLength(opts)
    assert sfl({"audio": np.zeros(10, np.float32)})["audio"].shape == (64,)
    assert sfl({"audio": np.zeros(100, np.float32)})["audio"].shape == (64,)
    r = AudioRoll(_opts())
    x = np.arange(100, dtype=np.float32)
    assert sorted(r({"audio": x})["audio"].tolist()) == sorted(x.tolist())


def test_resample_reference_flag_takes_priority():
    from cvnets_tpu.data.transforms.audio import AudioResample

    opts = _opts(["--audio-augmentation.audio-resample.audio-fps", "8000"])
    t = AudioResample(opts)
    audio = np.sin(np.linspace(0, 20, 1600)).astype(np.float32)
    out = t({"audio": audio, "metadata": {"audio_fps": 16000}})
    assert out["audio"].shape == (800,)
    assert out["metadata"]["audio_fps"] == 8000


def test_mfcc_shape():
    from cvnets_tpu.data.transforms.audio import MFCCs

    t = MFCCs(_opts())
    out = t({"audio": np.random.default_rng(0).normal(size=16000)
             .astype(np.float32), "metadata": {"audio_fps": 16000}})["audio"]
    assert out.shape == (98, 40)  # (frames, n_mfcc): 1+(16000-400)//160 frames


def _make_speech_commands_root(tmp_path, n_per_class=3):
    rng = np.random.default_rng(0)
    root = tmp_path / "sc"
    root.mkdir()
    val_list, test_list = [], []
    for cls in ("yes", "no"):
        cdir = root / cls
        cdir.mkdir()
        for i in range(n_per_class):
            name = f"{cls}/f{i}.wav"
            _write_wav(str(root / name),
                       rng.normal(scale=0.1, size=8000).astype(np.float32))
            if i == n_per_class - 1:
                val_list.append(name)
    bg = root / "_background_noise_"
    bg.mkdir()
    _write_wav(str(bg / "hum.wav"),
               rng.normal(scale=0.05, size=32000).astype(np.float32))
    (root / "validation_list.txt").write_text("\n".join(val_list))
    (root / "testing_list.txt").write_text("\n".join(test_list))
    return str(root)


def test_speech_commands_waveform_pipeline_and_mixup(tmp_path):
    from cvnets_tpu.data.datasets.audio_classification.speech_commands_v2 import (
        CLASSES, SpeechCommandsV2)

    root = _make_speech_commands_root(tmp_path)
    opts = _opts([
        "--dataset.root-train", root,
        "--audio-augmentation.noise.enable",
        "--audio-augmentation.roll.enable",
        "--dataset.speech-commands-v2.mixup",
    ])
    setattr(opts, "dataset.speech_commands.as_bytes", False)
    ds = SpeechCommandsV2(opts, is_training=True)
    assert len(ds) == 4  # 2 classes × (3 − 1 val)
    # train pipeline: fixed length + ambient noise + roll; mixup → soft targets
    item = ds[(0, 0, 0)]
    assert item["samples"].shape == (16000,)
    assert item["targets"].shape == (len(CLASSES),)
    assert item["targets"].sum() == pytest.approx(1.0, abs=1e-5)


def test_speech_commands_val_split_and_hard_targets(tmp_path):
    from cvnets_tpu.data.datasets.audio_classification.speech_commands_v2 import (
        SpeechCommandsV2)

    root = _make_speech_commands_root(tmp_path)
    opts = _opts(["--dataset.root-val", root])
    setattr(opts, "dataset.speech_commands.as_bytes", False)
    ds = SpeechCommandsV2(opts, is_training=False)
    assert len(ds) == 2  # one val file per class
    item = ds[(0, 0, 0)]
    assert item["samples"].shape == (16000,)
    assert isinstance(item["targets"], int)


def test_speech_commands_bytes_mode(tmp_path):
    from cvnets_tpu.data.datasets.audio_classification.speech_commands_v2 import (
        SpeechCommandsV2)

    root = _make_speech_commands_root(tmp_path)
    opts = _opts(["--dataset.root-train", root])
    ds = SpeechCommandsV2(opts, is_training=True)
    item = ds[(0, 0, 0)]
    assert item["samples"].dtype == np.int32
    assert item["samples"][:4].tobytes()[::4] == b"RIFF"
