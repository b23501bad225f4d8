"""Google Speech Commands v2 (parity: reference
data/datasets/audio_classification/speech_commands_v2.py:225).

WAV decode via the stdlib ``wave`` module (no torchaudio in env); serves either raw
bytes (ByteFormer) or fixed-length float audio."""

from __future__ import annotations

import os
import wave
from typing import Dict, List, Tuple

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseDataset

CLASSES = [
    "backward", "bed", "bird", "cat", "dog", "down", "eight", "five", "follow",
    "forward", "four", "go", "happy", "house", "learn", "left", "marvin", "nine",
    "no", "off", "on", "one", "right", "seven", "sheila", "six", "stop", "three",
    "tree", "two", "up", "visual", "wow", "yes", "zero",
]


@DATASET_REGISTRY.register(name="speech_commands_v2", type="audio_classification")
class SpeechCommandsV2(BaseDataset):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        self.as_bytes = getattr(opts, "dataset.speech_commands.as_bytes", True)
        self.mixup = getattr(opts, "dataset.speech_commands_v2.mixup", False)
        self.class_to_idx = {c: i for i, c in enumerate(CLASSES)}
        self.samples: List[Tuple[str, int]] = []
        root = self.root
        if root and os.path.isdir(root):
            val_list, test_list = set(), set()
            for name, bucket in (("validation_list.txt", val_list),
                                 ("testing_list.txt", test_list)):
                p = os.path.join(root, name)
                if os.path.isfile(p):
                    with open(p) as f:
                        bucket.update(l.strip() for l in f if l.strip())
            for cls in CLASSES:
                cdir = os.path.join(root, cls)
                if not os.path.isdir(cdir):
                    continue
                for fname in sorted(os.listdir(cdir)):
                    rel = f"{cls}/{fname}"
                    in_val = rel in val_list
                    in_test = rel in test_list
                    if is_training and not (in_val or in_test):
                        self.samples.append((os.path.join(cdir, fname),
                                             self.class_to_idx[cls]))
                    elif not is_training and (in_test if is_evaluation else in_val):
                        self.samples.append((os.path.join(cdir, fname),
                                             self.class_to_idx[cls]))
        # augmentation pipeline (reference speech_commands_v2.py:96-116):
        # train = set_fixed_length + ambient noise (from _background_noise_) + roll;
        # val = set_fixed_length only
        from cvnets_tpu.data.transforms.audio import (AudioNoise, AudioRoll,
                                                      SetFixedLength)

        self._transforms = [SetFixedLength(opts)]
        if is_training:
            if getattr(opts, "audio_augmentation.noise.enable", False):
                bg = os.path.join(self.root or "", "_background_noise_")
                self._transforms.append(AudioNoise(
                    opts, noise_files_dir=bg if os.path.isdir(bg) else None))
            if getattr(opts, "audio_augmentation.roll.enable", False):
                self._transforms.append(AudioRoll(opts))

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--dataset.speech-commands.as-bytes", action="store_true",
                           default=True)
        # reference speech_commands_v2.py:89-93: waveform mixup inside the dataset
        group.add_argument("--dataset.speech-commands-v2.mixup",
                           action="store_true", default=False)
        return parser

    def share_dataset_arguments(self) -> Dict:
        return {"model.classification.n_classes": len(CLASSES)}

    def __len__(self) -> int:
        return len(self.samples)

    def _get_waveform_sample(self, idx: int) -> Dict:
        path, target = self.samples[idx]
        with wave.open(path, "rb") as w:
            n = w.getnframes()
            audio = np.frombuffer(w.readframes(n), np.int16).astype(np.float32)
            audio /= 32768.0
            fps = float(w.getframerate())
        data = {"audio": audio, "metadata": {"audio_fps": fps}}
        for t in self._transforms:
            data = t(data)
        return {"audio": data["audio"], "target": int(target)}

    def __getitem__(self, sample_size_and_index) -> Dict:
        _h, _w, idx = self._parse_batch_tuple(sample_size_and_index)
        if self.as_bytes:
            path, target = self.samples[idx]
            with open(path, "rb") as f:
                raw = np.frombuffer(f.read(), np.uint8).astype(np.int32)
            return {"samples": raw, "targets": int(target), "sample_id": idx}
        data = self._get_waveform_sample(idx)
        audio, target = data["audio"], data["target"]
        if self.mixup and self.is_training:
            # waveform mixup with soft one-hot targets
            # (reference speech_commands_v2.py:160-182)
            other = self._get_waveform_sample(
                np.random.randint(0, len(self.samples)))
            lam = float(np.random.rand())
            audio = audio * lam + other["audio"] * (1.0 - lam)
            soft = np.zeros((len(CLASSES),), np.float32)
            soft[target] += lam
            soft[other["target"]] += 1.0 - lam
            return {"samples": audio.astype(np.float32), "targets": soft,
                    "sample_id": idx}
        return {"samples": audio.astype(np.float32), "targets": target,
                "sample_id": idx}
