"""Logit-equivalence tests against the *reference* torch models (VERDICT r1 item 2).

For each model we build the reference torch module in-env (tests/reference_interop.py),
take its random-init state_dict, convert it through
``cvnets_tpu.utils.torch_checkpoint_converter.convert_torch_checkpoint``, and assert
the two frameworks produce the same logits on a shared input batch in eval mode.
This is the test that catches silently mis-mapped weights (same-shape swaps,
transposed square kernels) that structural matching alone cannot.

Reference: /root/reference/cvnets/models/__init__.py:23 (get_model),
/root/reference/cvnets/misc/common.py:35-119 (load_pretrained_model).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")  # for reference_interop when run from repo root

from reference_interop import build_reference_model, reference_available  # noqa: E402

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason="reference tree not present"),
    # thorough cross-framework checks belong in the full suite, not the
    # quick gate (VERDICT r1 weak #7)
    pytest.mark.slow,
]


def _our_logits(opts, x_nhwc: np.ndarray, torch_state: dict) -> tuple:
    import jax
    import jax.numpy as jnp

    from cvnets_tpu.models import get_model
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.asarray(x_nhwc), training=False
    )
    params, batch_stats, unmatched = convert_torch_checkpoint(
        torch_state, variables["params"], variables.get("batch_stats")
    )
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    logits = model.apply(new_vars, jnp.asarray(x_nhwc), training=False)
    if isinstance(logits, dict):
        logits = logits.get("logits", next(iter(logits.values())))
    return np.asarray(logits), unmatched


def _ref_logits(opts, x_nhwc: np.ndarray) -> tuple:
    import torch

    ref = build_reference_model(opts)
    # perturb BN running stats / weights away from defaults so a mismapped
    # (mean, var) pairing cannot hide behind the (0, 1) init
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(0.05 * torch.randn(buf.shape, generator=gen))
            elif name.endswith("running_var"):
                buf.mul_(1.0 + 0.1 * torch.rand(buf.shape, generator=gen))
    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        y = ref(x)
    if isinstance(y, dict):
        y = y.get("logits", next(iter(y.values())))
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    return y.numpy(), state


def _run_parity(model_name: str, extra_args: list, hw: int = 64, atol: float = 1e-4):
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.classification.name", model_name,
        "--model.classification.n-classes", "13",
        "--dataset.category", "classification",
        *extra_args,
    ])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, hw, hw, 3)).astype(np.float32)

    ref_y, state = _ref_logits(opts, x)
    our_y, unmatched = _our_logits(opts, x, state)

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"{model_name}: unmatched leaves: {real_unmatched[:10]}"
    assert our_y.shape == ref_y.shape, f"{model_name}: {our_y.shape} vs {ref_y.shape}"
    diff = float(np.max(np.abs(our_y - ref_y)))
    assert diff < atol, f"{model_name}: max |logit diff| = {diff:.2e} >= {atol}"


def test_parity_mobilenetv2():
    _run_parity("mobilenetv2", [
        "--model.classification.mobilenetv2.width-multiplier", "1.0",
    ])


def test_parity_resnet50():
    _run_parity("resnet", ["--model.classification.resnet.depth", "50"])


def test_parity_mobilevit_v2():
    _run_parity(
        "mobilevit_v2",
        ["--model.classification.mitv2.width-multiplier", "0.5",
         "--model.activation.name", "swish"],
        hw=64,
    )


def test_parity_vit():
    _run_parity(
        "vit",
        ["--model.classification.vit.mode", "tiny",
         "--model.classification.vit.norm-layer", "layer_norm"],
        hw=64,
        atol=5e-4,  # LN + GELU accumulate slightly more fp32 noise
    )


def test_parity_mobilenetv1():
    _run_parity("mobilenetv1", [
        "--model.classification.mobilenetv1.width-multiplier", "1.0"])


def test_parity_mobilenetv1_w050():
    """Non-1.0 width: catches stem/width-scaling drift (the r3 mnv2 bug —
    the reference does NOT width-scale every stage the same way)."""
    _run_parity("mobilenetv1", [
        "--model.classification.mobilenetv1.width-multiplier", "0.5"])


def test_parity_mobilenetv2_w050():
    """Reference keeps conv_1 at 32 channels at every width multiplier
    (reference mobilenetv2.py:35); width-1.0 testing cannot see this."""
    _run_parity("mobilenetv2", [
        "--model.classification.mobilenetv2.width-multiplier", "0.5",
    ])


def test_parity_mobilenetv3():
    _run_parity("mobilenetv3", [], hw=64)


def test_parity_efficientnet_b0():
    _run_parity(
        "efficientnet",
        ["--model.classification.efficientnet.mode", "b0"], hw=64)


def test_parity_mobilevit_v1():
    _run_parity(
        "mobilevit",
        ["--model.classification.mit.mode", "x_small",
         "--model.activation.name", "swish"],
        hw=64, atol=5e-4)


def test_parity_mobileone_s1():
    _run_parity("mobileone", [
        "--model.classification.mobileone.variant", "s1"], hw=64)


def test_parity_swin_tiny():
    _run_parity(
        "swin",
        ["--model.classification.swin.mode", "tiny"],
        hw=64, atol=5e-4)


def test_parity_regnet_y_200mf():
    _run_parity(
        "regnet", ["--model.classification.regnet.mode", "y_200mf"], hw=64)


def test_parity_fastvit_t8():
    _run_parity(
        "fastvit",
        ["--model.classification.fastvit.variant", "T8",
         "--model.activation.name", "gelu"],
        hw=64, atol=5e-4)


def test_parity_segmentation_deeplabv3_mobilenetv2():
    """Converter walk across an encoder-decoder tree: MobileNetV2 backbone +
    ASPP head (reference cvnets/models/segmentation/enc_dec.py:95)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--dataset.category", "segmentation",
        "--model.segmentation.name", "encoder_decoder",
        "--model.segmentation.seg-head", "deeplabv3",
        "--model.segmentation.n-classes", "13",
        "--model.segmentation.output-stride", "16",
        "--model.classification.name", "mobilenetv2",
    ])
    # attrs the reference reads but our parser doesn't define
    setattr(opts, "model.segmentation.norm_layer", None)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    ref = build_reference_model(opts, category="segmentation")
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref_y = ref(xt)
    if isinstance(ref_y, (tuple, list)):
        ref_y = ref_y[0]
    ref_y = ref_y.numpy().transpose(0, 2, 3, 1)  # NCHW → NHWC
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.asarray(x), training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    our_y = np.asarray(model.apply(new_vars, jnp.asarray(x), training=False))
    if isinstance(our_y, dict):
        our_y = our_y["segmentation_output"]

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"unmatched leaves: {real_unmatched[:10]}"
    assert our_y.shape == ref_y.shape
    # bilinear-upsample borders differ slightly between frameworks; compare
    # the dominant signal: max diff and per-pixel argmax agreement
    diff = float(np.max(np.abs(our_y - ref_y)))
    assert diff < 5e-3, f"segmentation max |logit diff| = {diff:.2e}"
    agree = float(np.mean(our_y.argmax(-1) == ref_y.argmax(-1)))
    assert agree > 0.999, f"argmax agreement {agree}"


def test_parity_ssd_mobilenetv2():
    """Converter walk across the SSD tree: extra-stride layers + per-stride
    heads + anchors (reference cvnets/models/detection/ssd.py:326-392)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--dataset.category", "detection",
        "--model.detection.name", "ssd",
        "--model.detection.n-classes", "7",
        "--model.classification.name", "mobilenetv2",
        "--anchor-generator.name", "ssd",
        "--matcher.name", "ssd",
    ])
    # our parser registers these with default None; the reference reads them
    # with getattr defaults that never fire on an existing attr — pin them
    setattr(opts, "anchor_generator.ssd.output_strides", [16, 32, 64, 128, 256, -1])
    setattr(opts, "anchor_generator.ssd.aspect_ratios", [[2, 3]] * 6)
    setattr(opts, "anchor_generator.ssd.min_scale_ratio", 0.1)
    setattr(opts, "anchor_generator.ssd.max_scale_ratio", 1.05)
    setattr(opts, "model.detection.ssd.output_strides", [16, 32, 64, 128, 256, -1])
    setattr(opts, "model.detection.ssd.proj_channels", [512, 256, 256, 128, 128, 64])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)

    ref = build_reference_model(opts, category="detection")
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref_out = ref(xt)
    if isinstance(ref_out, dict):
        ref_conf, ref_loc = ref_out["scores"], ref_out["boxes"]
    else:
        ref_conf, ref_loc = ref_out[0], ref_out[1]
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.asarray(x), training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    out = model.apply(new_vars, jnp.asarray(x), training=False)

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"unmatched leaves: {real_unmatched[:10]}"
    our_conf = np.asarray(out["scores"])
    our_loc = np.asarray(out["boxes"])
    assert our_conf.shape == tuple(ref_conf.shape), (
        f"{our_conf.shape} vs {tuple(ref_conf.shape)}")
    cdiff = float(np.max(np.abs(our_conf - ref_conf.numpy())))
    ldiff = float(np.max(np.abs(our_loc - ref_loc.numpy())))
    assert cdiff < 1e-3, f"ssd conf max diff {cdiff:.2e}"
    assert ldiff < 1e-3, f"ssd loc max diff {ldiff:.2e}"


def test_parity_clip_mobilenetv2():
    """Converter walk across the CLIP tree: image encoder with projection head,
    text transformer with causal masking, logit_scale scalar (reference
    cvnets/models/multi_modal_img_text/clip.py:144-211)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--dataset.category", "multi_modal_image_text",
        "--model.classification.name", "mobilenetv2",
    ])
    setattr(opts, "model.multi_modal_image_text.name", "clip")
    setattr(opts, "model.multi_modal_image_text.clip.projection_dim", 32)
    setattr(opts, "model.text.name", "transformer")
    setattr(opts, "model.text.vocab_size", 64)
    setattr(opts, "model.text.context_length", 12)
    setattr(opts, "model.text.transformer.model_dim", 48)
    setattr(opts, "model.text.transformer.n_transformer_layers", 2)
    setattr(opts, "model.text.transformer.n_heads_per_layer", [4, 4])
    setattr(opts, "model.text.transformer.ffn_multiplier_per_layer", 4.0)
    setattr(opts, "model.text.transformer.causal_masking", True)
    setattr(opts, "model.text.transformer.norm_layer", "layer_norm")
    # attrs only the reference reads
    setattr(opts, "dataset.text_vocab_size", 64)
    setattr(opts, "dataset.text_context_length", 12)
    setattr(opts, "dataset.padding_index", None)
    setattr(opts, "model.multi_modal_image_text.freeze_batch_norm", False)
    setattr(opts, "model.image_projection_head.name", "global_pool_nchw2nc")
    setattr(opts,
            "model.image_projection_head.global_pool_nchw2nc.identity_if_same_size",
            False)
    setattr(opts,
            "model.image_projection_head.global_pool_nchw2nc.no_feature_normalization",
            False)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    tokens = rng.integers(1, 62, (2, 12))
    tokens[:, -1] = 63  # EOT = max id, feature taken at argmax position

    ref = build_reference_model(opts, category="multi_modal_image_text")
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref_out = ref({"image": xt, "text": torch.from_numpy(tokens)})
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    jx = jnp.asarray(x)
    jtok = jnp.asarray(tokens)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           {"image": jx, "text": jtok}, training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    out = model.apply(new_vars, {"image": jx, "text": jtok}, training=False)

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"unmatched leaves: {real_unmatched[:10]}"

    def norm(a):
        a = np.asarray(a, np.float32)
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    img_diff = float(np.max(np.abs(norm(out["image"]) - norm(ref_out["image"]))))
    txt_diff = float(np.max(np.abs(norm(out["text"]) - norm(ref_out["text"]))))
    assert img_diff < 1e-3, f"clip image emb max diff {img_diff:.2e}"
    assert txt_diff < 1e-3, f"clip text emb max diff {txt_diff:.2e}"


def test_parity_byteformer_tiny():
    """Converter walk across ByteFormer: byte embedding, conv token reduction,
    windowed transformer stack with shifts, token-merging downsamplers
    (reference cvnets/models/classification/byteformer.py:412-431)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--dataset.category", "classification",
        "--model.classification.name", "byteformer",
        "--model.classification.n-classes", "13",
        "--model.classification.byteformer.mode", "tiny",
        "--model.classification.byteformer.conv-kernel-size", "8",
        "--model.classification.byteformer.max-num-tokens", "1024",
        "--model.classification.byteformer.window-sizes", "32",
        "--model.activation.name", "gelu",
    ])
    n_layers = 12
    setattr(opts, "model.classification.byteformer.window_shifts",
            [0 if i % 2 == 0 else 16 for i in range(n_layers)])
    setattr(opts, "model.classification.byteformer.downsample",
            [i % 4 == 3 for i in range(n_layers)])
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (2, 512))

    ref = build_reference_model(opts)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(tokens))
    if isinstance(ref_y, dict):
        ref_y = ref_y.get("logits", next(iter(ref_y.values())))
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    jtok = jnp.asarray(tokens)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, jtok,
                           training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    our_y = np.asarray(model.apply(new_vars, jtok, training=False))
    if isinstance(our_y, dict):
        our_y = our_y.get("logits", next(iter(our_y.values())))

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"unmatched leaves: {real_unmatched[:10]}"
    assert our_y.shape == ref_y.numpy().shape
    diff = float(np.max(np.abs(our_y - ref_y.numpy())))
    assert diff < 5e-4, f"byteformer max |logit diff| = {diff:.2e}"


def test_parity_segmentation_pspnet_mobilenetv2():
    """PSP head variant of the encoder-decoder parity walk (reference
    cvnets/models/segmentation/heads/pspnet.py:19)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--dataset.category", "segmentation",
        "--model.segmentation.name", "encoder_decoder",
        "--model.segmentation.seg-head", "pspnet",
        "--model.segmentation.n-classes", "13",
        "--model.segmentation.output-stride", "16",
        "--model.classification.name", "mobilenetv2",
    ])
    setattr(opts, "model.segmentation.norm_layer", None)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    ref = build_reference_model(opts, category="segmentation")
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref_y = ref(xt)
    if isinstance(ref_y, (tuple, list)):
        ref_y = ref_y[0]
    ref_y = ref_y.numpy().transpose(0, 2, 3, 1)
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.asarray(x), training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    our_y = np.asarray(model.apply(new_vars, jnp.asarray(x), training=False))
    if isinstance(our_y, dict):
        our_y = our_y["segmentation_output"]

    real_unmatched = [u for u in unmatched if "num_batches_tracked" not in u]
    assert not real_unmatched, f"unmatched leaves: {real_unmatched[:10]}"
    assert our_y.shape == ref_y.shape
    diff = float(np.max(np.abs(our_y - ref_y)))
    assert diff < 5e-3, f"pspnet max |logit diff| = {diff:.2e}"
    agree = float(np.mean(our_y.argmax(-1) == ref_y.argmax(-1)))
    assert agree > 0.999, f"argmax agreement {agree}"


def test_parity_gradients_mobilenetv2():
    """Beyond eval logits: cross-entropy GRADIENTS must match the reference's
    autograd on the same weights/input (training-mode numerics — catches bad
    custom VJPs, stop-gradients, and dtype threading)."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import convert_torch_checkpoint

    opts = get_training_arguments(args=[
        "--model.classification.name", "mobilenetv2",
        "--model.classification.n-classes", "13",
        "--dataset.category", "classification",
    ])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    y = np.asarray([3, 7])

    ref = build_reference_model(opts)
    ref.eval()  # freeze BN stat updates; gradients still flow
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    logits = ref(xt)
    loss_t = torch.nn.functional.cross_entropy(logits, torch.from_numpy(y))
    loss_t.backward()
    ref_w = dict(ref.named_parameters())
    # representative weights: first conv, a depthwise conv, the classifier
    ref_grads = {
        "first_conv": ref_w["conv_1.block.conv.weight"].grad.numpy(),
        "classifier_w": ref_w["classifier.classifier_fc.weight"].grad.numpy(),
        "classifier_b": ref_w["classifier.classifier_fc.bias"].grad.numpy(),
    }
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = get_model(opts)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.asarray(x), training=False)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        state, variables["params"], variables.get("batch_stats"))
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats

    def loss_fn(p):
        v = dict(new_vars, params=p)
        logits = model.apply(v, jnp.asarray(x), training=False)
        if isinstance(logits, dict):
            logits = logits["logits"]
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()

    loss_j, grads = jax.value_and_grad(loss_fn)(new_vars["params"])
    assert abs(float(loss_j) - float(loss_t)) < 1e-4

    def leaf(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    # conv grads: flax HWIO vs torch OIHW
    g_conv = leaf(grads, ("conv_1", "conv", "kernel")).transpose(3, 2, 0, 1)
    assert np.max(np.abs(g_conv - ref_grads["first_conv"])) < 1e-4
    g_w = leaf(grads, ("classifier", "fc", "kernel")).T
    assert np.max(np.abs(g_w - ref_grads["classifier_w"])) < 1e-4
    g_b = leaf(grads, ("classifier", "fc", "bias"))
    assert np.max(np.abs(g_b - ref_grads["classifier_b"])) < 1e-4


def test_parity_mobilevit_v2_width_100():
    """Flagship width (the benched configuration): catches drift in the
    width-multiplier config table beyond the 0.5 spot check."""
    _run_parity(
        "mobilevit_v2",
        ["--model.classification.mitv2.width-multiplier", "1.0",
         "--model.activation.name", "swish"],
        hw=64,
    )


def test_parity_efficientnet_b1():
    """Compound scaling beyond B0 (depth/width round-up rules)."""
    _run_parity(
        "efficientnet",
        ["--model.classification.efficientnet.mode", "b1"], hw=64, atol=5e-4)


def _temporal_parity(model_name: str, extra_args: list, hw: int = 32,
                     frames: int = 3, atol: float = 1e-4):
    """forward_temporal parity (VERDICT r1 #4): chain a clip frame-by-frame
    through MobileViT blocks with the previous frame's patches as the
    cross-attention context, in BOTH frameworks, on converted weights."""
    import jax
    import jax.numpy as jnp
    import torch

    from cvnets_tpu.models import get_model
    from cvnets_tpu.modules.mobilevit_block import (
        MobileViTBlock,
        MobileViTBlockv2,
    )
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.utils.torch_checkpoint_converter import (
        convert_torch_checkpoint,
    )

    args = ["--model.classification.name", model_name,
            "--model.classification.n-classes", "11",
            "--dataset.category", "classification"] + extra_args
    opts = get_training_arguments(args=args)
    setattr(opts, "model.enable_pallas_kernels", False)

    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, frames, hw, hw, 3)).astype(np.float32) * 0.5

    ref = build_reference_model(opts)
    torch_state = {k: v.detach().numpy()
                   for k, v in ref.state_dict().items()}

    # ---- ours: extract_features_temporal chained over frames -------------
    model = get_model(opts)
    jrng = jax.random.PRNGKey(0)

    def run_temporal(variables, clip_j):
        prev = None
        outs = []
        for t in range(frames):
            feats, prev = model.apply(
                variables, clip_j[:, t], prev, False,
                method=model.extract_features_temporal)
            outs.append(feats)
        return outs

    # cross-attn reuses the fused qkv weights, so a single-frame init
    # creates every parameter the temporal path touches
    variables = model.init({"params": jrng, "dropout": jrng},
                           jnp.asarray(clip[:, 0]), None, False,
                           method=model.extract_features_temporal)
    params, batch_stats, unmatched = convert_torch_checkpoint(
        torch_state, variables["params"], variables.get("batch_stats"))
    # the feature extractor does not touch the classifier head
    residue = [u for u in unmatched if "classifier" not in u]
    assert not residue, f"unconverted torch tensors: {residue[:5]}"
    new_vars = dict(variables, params=params)
    if batch_stats is not None and "batch_stats" in variables:
        new_vars["batch_stats"] = batch_stats
    ours = run_temporal(new_vars, jnp.asarray(clip))
    ours = [np.asarray(o) for o in ours]

    # ---- reference: manual frame-recurrent walk over the torch model -----
    is_v2 = model_name == "mobilevit_v2"
    ref.eval()

    def ref_run(clip_t):
        from cvnets.modules.mobilevit_block import (
            MobileViTBlock as TorchV1,
            MobileViTBlockv2 as TorchV2,
        )

        prev: dict = {}
        outs = []
        for t in range(frames):
            x = clip_t[:, t]
            new_prev: dict = {}
            for sname in ("conv_1", "layer_1", "layer_2", "layer_3",
                          "layer_4", "layer_5", "conv_1x1_exp"):
                stage = getattr(ref, sname, None)
                if stage is None:
                    continue
                children = (list(stage.children())
                            if isinstance(stage, torch.nn.Sequential)
                            else [stage])
                for k, m in enumerate(children):
                    key = f"{sname}.{k}"
                    if isinstance(m, (TorchV1, TorchV2)):
                        x, patches = m((x, prev.get(key)))
                        new_prev[key] = patches
                    else:
                        x = m(x)
            prev = new_prev
            outs.append(x.detach().numpy())
        return outs

    with torch.no_grad():
        clip_t = torch.tensor(clip).permute(0, 1, 4, 2, 3)
        refs = ref_run(clip_t)

    for t, (a, b) in enumerate(zip(ours, refs)):
        b_nhwc = np.transpose(b, (0, 2, 3, 1))
        assert np.abs(a - b_nhwc).max() < atol, (
            t, float(np.abs(a - b_nhwc).max()))


def test_temporal_parity_mobilevit_v2():
    _temporal_parity("mobilevit_v2", [
        "--model.classification.mitv2.width-multiplier", "0.5"])


def test_temporal_parity_mobilevit_v1():
    _temporal_parity("mobilevit", [
        "--model.classification.mit.mode", "x_small",
        "--model.activation.name", "swish"])
