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
