"""Collate-fn unit tests (reference data/collate_fns/collate_functions.py:85-103,
byteformer_collate_functions.py:29,244).

TPU-native divergence under test: corrupt samples are REPLACED with valid ones
(keeping batch shapes static for XLA) instead of dropped; byteformer sequences
pad to power-of-two buckets so each bucket is one cached executable.
"""

import numpy as np

from cvnets_tpu.data.collate.byteformer_collate_functions import (
    MIN_BUCKET, PAD_VALUE, byteformer_image_collate_fn)
from cvnets_tpu.data.collate.collate_functions import (
    default_collate_fn, unlabeled_image_data_collate_fn)


def _item(val, target, idx):
    return {"samples": np.full((4, 4, 3), val, np.float32),
            "targets": target, "sample_id": idx}


def test_default_collate_stacks_and_types():
    out = default_collate_fn([_item(0.1, 3, 0), _item(0.2, 5, 1)])
    assert out["samples"].shape == (2, 4, 4, 3)
    assert out["targets"].dtype == np.int32
    assert out["targets"].tolist() == [3, 5]
    assert out["sample_id"].tolist() == [0, 1]


def test_corrupt_samples_replaced_not_dropped():
    batch = [_item(0.1, -1, 0), _item(0.2, 7, 1), _item(0.3, -1, 2)]
    out = default_collate_fn(batch)
    # static shape preserved; every slot holds the valid sample
    assert out["samples"].shape == (3, 4, 4, 3)
    assert out["targets"].tolist() == [7, 7, 7]


def test_all_corrupt_batch_flows_through():
    batch = [_item(0.1, -1, 0), _item(0.2, -1, 1)]
    out = default_collate_fn(batch)
    assert out["targets"].tolist() == [-1, -1]  # masked later in the loss


def test_nested_dict_and_str_fields():
    batch = [{"samples": {"image": np.zeros((2, 2)), "text": "a photo"},
              "targets": 0},
             {"samples": {"image": np.ones((2, 2)), "text": "a sketch"},
              "targets": 1}]
    out = default_collate_fn(batch)
    assert out["samples"]["image"].shape == (2, 2, 2)
    assert out["samples"]["text"] == ["a photo", "a sketch"]


def test_unlabeled_collate_drops_targets():
    out = unlabeled_image_data_collate_fn([_item(0.5, 1, 0)])
    assert "targets" not in out


def test_byteformer_bucket_padding():
    seqs = [{"samples": np.arange(n, dtype=np.int32), "targets": 0}
            for n in (10, MIN_BUCKET + 1)]
    out = byteformer_image_collate_fn(seqs)
    # bucket = next power of two ≥ longest sequence
    assert out["samples"].shape == (2, MIN_BUCKET * 2)
    assert (out["samples"][0, 10:] == PAD_VALUE).all()
    assert (out["samples"][1, :MIN_BUCKET + 1] ==
            np.arange(MIN_BUCKET + 1)).all()


def test_byteformer_same_bucket_reuses_shape():
    a = byteformer_image_collate_fn(
        [{"samples": np.zeros(MIN_BUCKET - 3, np.int32), "targets": 0}])
    b = byteformer_image_collate_fn(
        [{"samples": np.zeros(MIN_BUCKET - 1, np.int32), "targets": 0}])
    assert a["samples"].shape == b["samples"].shape == (1, MIN_BUCKET)


def test_byteformer_image_collate_applies_byte_chain():
    """Flag-gated byte transforms run inside the collate (reference
    byteformer_collate_functions.py:46-51): pil_save turns float images into
    JPEG file bytes; random_uniform perturbs them; disabled flags no-op."""
    import numpy as np

    from cvnets_tpu.data.collate.byteformer_collate_functions import (
        byteformer_image_collate_fn,
    )
    from cvnets_tpu.options.opts import get_training_arguments

    rng = np.random.default_rng(0)
    batch = [{"samples": rng.random((32, 32, 3)).astype(np.float32),
              "targets": i} for i in range(2)]

    opts = get_training_arguments(args=[
        "--image-augmentation.pil-save.enable",
        "--image-augmentation.pil-save.encoding", "jpeg",
        "--image-augmentation.pil-save.quality", "60",
    ])
    out = byteformer_image_collate_fn([dict(b) for b in batch], opts)
    seq = out["samples"][0]
    real = seq[seq >= 0]
    assert real[0] == 0xFF and real[1] == 0xD8  # JPEG SOI marker
    assert out["samples"].shape[1] >= 256

    # random_uniform on top changes the bytes (mod-256 wrap, padding intact)
    opts2 = get_training_arguments(args=[
        "--image-augmentation.pil-save.enable",
        "--image-augmentation.pil-save.encoding", "jpeg",
        "--image-augmentation.pil-save.quality", "60",
        "--image-augmentation.random-uniform.enable",
        "--image-augmentation.random-uniform.width-range", "-20", "20",
    ])
    np.random.seed(0)
    out2 = byteformer_image_collate_fn([dict(b) for b in batch], opts2)
    a, b = out["samples"], out2["samples"]
    n = min(a.shape[1], b.shape[1])
    assert (a[:, :n] != b[:, :n]).mean() > 0.5
    assert ((b >= -1) & (b < 256)).all()


def test_byteformer_audio_collate_serializes_waveform():
    """torchaudio_save.enable serializes float waveforms to WAV bytes at
    collate time (reference apply_torchaudio_save)."""
    import numpy as np

    from cvnets_tpu.data.collate.byteformer_collate_functions import (
        byteformer_audio_collate_fn,
    )
    from cvnets_tpu.options.opts import get_training_arguments

    wave = np.sin(np.linspace(0, 40, 1600)).astype(np.float32)
    batch = [{"samples": wave, "targets": 3}]
    opts = get_training_arguments(args=[
        "--audio-augmentation.torchaudio-save.enable",
        "--audio-augmentation.torchaudio-save.format", "wav",
        "--audio-augmentation.torchaudio-save.encoding-dtype", "int16",
    ])
    out = byteformer_audio_collate_fn(batch, opts)
    seq = out["samples"][0]
    real = seq[seq >= 0].astype(np.uint8)
    assert bytes(real[:4]) == b"RIFF"
