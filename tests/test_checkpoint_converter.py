"""torch → flax checkpoint converter tests (torch CPU is available in the env)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_convert_small_conv_bn_linear(tmp_path):
    import jax
    import torch.nn as nn

    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import (
        convert_torch_checkpoint,
        load_torch_state_dict,
    )

    # a torch module mirroring ConvLayer2d(conv+bn) + Dense
    tmodel = nn.Sequential(
        nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False),
        nn.BatchNorm2d(8),
        nn.Linear(8, 4),
    )
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_()
        tmodel[1].running_mean.normal_()
        tmodel[1].running_var.uniform_(0.5, 1.5)
    pt_path = tmp_path / "ckpt.pt"
    torch.save(tmodel.state_dict(), pt_path)

    # matching flax params
    import flax.linen as fnn
    import jax.numpy as jnp

    class FModel(fnn.Module):
        @fnn.compact
        def __call__(self, x, training=False):
            x = fnn.Conv(8, (3, 3), strides=(2, 2), use_bias=False,
                         padding=((1, 1), (1, 1)), name="conv")(x)
            x = fnn.BatchNorm(use_running_average=True, name="norm")(x)
            x = x.mean(axis=(1, 2))
            return fnn.Dense(4, name="fc")(x)

    fm = FModel()
    variables = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))

    sd = load_torch_state_dict(str(pt_path))
    new_params, new_bs, unmatched = convert_torch_checkpoint(
        sd, variables["params"], variables["batch_stats"]
    )
    assert not unmatched, unmatched

    # conv kernel transposed OIHW->HWIO
    np.testing.assert_allclose(
        np.asarray(new_params["conv"]["kernel"]),
        sd["0.weight"].transpose(2, 3, 1, 0), atol=1e-6)
    # linear transposed
    np.testing.assert_allclose(
        np.asarray(new_params["fc"]["kernel"]), sd["2.weight"].T, atol=1e-6)
    # bn stats mapped
    np.testing.assert_allclose(
        np.asarray(new_bs["norm"]["mean"]), sd["1.running_mean"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_bs["norm"]["var"]), sd["1.running_var"], atol=1e-6)

    # numerically: same forward as torch
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 3)).astype(np.float32)
    f_out = fm.apply({"params": new_params, "batch_stats": new_bs},
                     jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tmodel.eval()
        t1 = tmodel[1](tmodel[0](t))
        t_out = tmodel[2](t1.mean(dim=(2, 3)))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-4)


def test_finetune_scope_surgery(tmp_path):
    """load_model_weights honors rename / exclude / ignore-missing scopes and
    keeps fresh init on shape mismatch (reference cvnets/misc/common.py:54-109)."""
    import argparse

    import numpy as np

    from cvnets_tpu.utils.checkpoint_utils import load_model_weights, save_pytree

    ckpt = {
        "params": {
            "encoder": {"w": np.full((3, 3), 2.0, np.float32)},
            "old_head": {"fc": np.full((3, 5), 7.0, np.float32)},
            "mismatch": {"w": np.zeros((9, 9), np.float32)},
        }
    }
    path = str(tmp_path / "weights.ckpt")
    save_pytree(path, ckpt)

    model_params = {
        "encoder": {"w": np.zeros((3, 3), np.float32)},
        "head": {"fc": np.ones((3, 5), np.float32)},      # renamed from old_head
        "classifier": {"b": np.ones((4,), np.float32)},   # not in ckpt: ignored
        "mismatch": {"w": np.ones((2, 2), np.float32)},   # shape mismatch: init
    }
    opts = argparse.Namespace()
    setattr(opts, "model.rename_scopes_map", ["old_head:head"])
    setattr(opts, "model.resume_exclude_scopes", "encoder")
    setattr(opts, "model.ignore_missing_scopes", "classifier")

    out, _ = load_model_weights(path, model_params, opts=opts)
    assert (out["encoder"]["w"] == 0).all()      # excluded -> fresh init
    assert (out["head"]["fc"] == 7).all()        # renamed ckpt key applied
    assert (out["classifier"]["b"] == 1).all()   # missing but ignored
    assert out["mismatch"]["w"].shape == (2, 2)  # mismatch -> fresh init


def test_pt_file_roundtrip_logit_parity(tmp_path):
    """Save a reference torch model to .pt, load through load_cvnets_checkpoint
    (the --common.finetune path), and verify logits — covers the file-reading
    layer on top of convert_torch_checkpoint."""
    import sys

    sys.path.insert(0, "tests")
    import numpy as np
    import pytest
    import torch
    from reference_interop import build_reference_model, reference_available

    if not reference_available():
        pytest.skip("reference tree not present")

    import jax
    import jax.numpy as jnp

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import load_cvnets_checkpoint

    opts = get_training_arguments(args=[
        "--model.classification.name", "mobilenetv2",
        "--model.classification.n-classes", "11",
        "--model.classification.mobilenetv2.width-multiplier", "0.5",
        "--dataset.category", "classification",
    ])
    ref = build_reference_model(opts)
    path = str(tmp_path / "ref.pt")
    torch.save(ref.state_dict(), path)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()

    model = get_model(opts)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                           training=False)
    params, bstats = load_cvnets_checkpoint(
        opts, path, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if bstats is not None:
        new_vars["batch_stats"] = bstats
    our_y = np.asarray(model.apply(new_vars, jnp.asarray(x), training=False))
    assert np.abs(our_y - ref_y).max() < 1e-4
