"""Interop helpers to build *reference* torch models in-env for parity tests.

The image has torch (CPU) but no torchvision, so we install a minimal stub that
covers exactly the symbols the reference model library imports at module scope
(reference cvnets/layers/stochastic_depth.py:7, cvnets/modules/ssd_heads.py:10,
cvnets/models/detection/{mask_rcnn.py:14-16, ssd.py:13}). Classification models
never *call* the detection stubs; StochasticDepth gets a real implementation
because EfficientNet/Swin/FastViT use it (identity in eval mode regardless).

We feed the reference model classes *our* opts namespace — the dotted dest names
are the compatibility contract shared by both arg systems.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:  # stub (or real lib) already installed
        return
    if importlib.util.find_spec("torchvision") is not None:  # real lib present
        return

    import torch
    from torch import nn

    def stochastic_depth(input, p, mode, training=True):
        if p < 0.0 or p > 1.0:
            raise ValueError(f"drop probability must be in [0, 1], got {p}")
        if mode not in ("batch", "row"):
            raise ValueError(f"mode must be 'batch' or 'row', got {mode}")
        if p == 0.0 or not training:
            return input
        survival_rate = 1.0 - p
        if mode == "row":
            size = [input.shape[0]] + [1] * (input.ndim - 1)
        else:
            size = [1] * input.ndim
        noise = torch.empty(size, dtype=input.dtype, device=input.device)
        noise = noise.bernoulli_(survival_rate)
        if survival_rate > 0.0:
            noise.div_(survival_rate)
        return input * noise

    class StochasticDepth(nn.Module):
        def __init__(self, p: float, mode: str) -> None:
            super().__init__()
            self.p = p
            self.mode = mode

        def forward(self, input):
            return stochastic_depth(input, self.p, self.mode, self.training)

        def __repr__(self) -> str:
            return f"{self.__class__.__name__}(p={self.p}, mode={self.mode})"

    class _ImportOnlyStub:
        """Placeholder for detection-only symbols; import-safe, call-unsafe."""

        def __init__(self, *args, **kwargs):
            raise NotImplementedError(
                f"{type(self).__name__} is a parity-test stub; torchvision is"
                " not installed in this environment."
            )

    class RoIAlign(_ImportOnlyStub):
        pass

    class MultiScaleRoIAlign(_ImportOnlyStub):
        pass

    class AnchorGenerator(_ImportOnlyStub):
        pass

    class MaskRCNN(_ImportOnlyStub):
        pass

    def batched_nms(boxes, scores, idxs, iou_threshold):
        # pure-torch greedy NMS with the class-offset trick (torchvision
        # semantics); only used by parity tests, perf is irrelevant
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        offsets = idxs.to(boxes) * (boxes.max() + 1.0)
        b = boxes + offsets[:, None]
        areas = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
        order = scores.argsort(descending=True)
        suppressed = torch.zeros(b.shape[0], dtype=torch.bool)
        keep = []
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = torch.maximum(b[i, 0], b[:, 0])
            yy1 = torch.maximum(b[i, 1], b[:, 1])
            xx2 = torch.minimum(b[i, 2], b[:, 2])
            yy2 = torch.minimum(b[i, 3], b[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[i] + areas - inter + 1e-12)
            suppressed |= iou > iou_threshold
        return torch.as_tensor(keep, dtype=torch.int64)

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0.0-stub"
    ops = types.ModuleType("torchvision.ops")
    ops.StochasticDepth = StochasticDepth
    ops.stochastic_depth = stochastic_depth
    ops.MultiScaleRoIAlign = MultiScaleRoIAlign
    ops.batched_nms = batched_nms
    roi_align_mod = types.ModuleType("torchvision.ops.roi_align")
    roi_align_mod.RoIAlign = RoIAlign
    ops.roi_align = roi_align_mod
    models = types.ModuleType("torchvision.models")
    detection = types.ModuleType("torchvision.models.detection")
    anchor_utils = types.ModuleType("torchvision.models.detection.anchor_utils")
    anchor_utils.AnchorGenerator = AnchorGenerator
    mask_rcnn_mod = types.ModuleType("torchvision.models.detection.mask_rcnn")
    mask_rcnn_mod.MaskRCNN = MaskRCNN
    detection.anchor_utils = anchor_utils
    detection.mask_rcnn = mask_rcnn_mod
    models.detection = detection
    tv.ops = ops
    tv.models = models

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.roi_align"] = roi_align_mod
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.detection"] = detection
    sys.modules["torchvision.models.detection.anchor_utils"] = anchor_utils
    sys.modules["torchvision.models.detection.mask_rcnn"] = mask_rcnn_mod


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_ROOT)


def build_reference_model(opts, category: str = "classification"):
    """Build a reference torch model from our opts namespace (shared dest names).

    Returns the torch nn.Module in eval mode.
    """
    install_torchvision_stub()
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never insert at 0: the reference tree has top-level modules
        # (main_train.py, main_eval.py, ...) that would shadow ours for every
        # test running after a parity test in the same session
        sys.path.append(REFERENCE_ROOT)
    from cvnets.models import get_model as ref_get_model  # noqa: reference import

    model = ref_get_model(opts, category=category)
    model.eval()
    return model
