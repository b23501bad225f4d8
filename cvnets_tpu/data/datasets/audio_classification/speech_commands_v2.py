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

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--dataset.speech-commands.as-bytes", action="store_true",
                           default=True)
        return parser

    def share_dataset_arguments(self) -> Dict:
        return {"model.classification.n_classes": len(CLASSES)}

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, sample_size_and_index) -> Dict:
        _h, _w, idx = self._parse_batch_tuple(sample_size_and_index)
        path, target = self.samples[idx]
        if self.as_bytes:
            with open(path, "rb") as f:
                raw = np.frombuffer(f.read(), np.uint8).astype(np.int32)
            return {"samples": raw, "targets": int(target), "sample_id": idx}
        with wave.open(path, "rb") as w:
            n = w.getnframes()
            audio = np.frombuffer(w.readframes(n), np.int16).astype(np.float32)
            audio /= 32768.0
        # fixed 1s @ 16kHz
        if len(audio) >= 16000:
            audio = audio[:16000]
        else:
            audio = np.pad(audio, (0, 16000 - len(audio)))
        return {"samples": audio, "targets": int(target), "sample_id": idx}
