"""CLIP model + contrastive loss + tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np


def _clip_opts():
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.classification.name", "mobilenetv2",
        "--dataset.category", "multi_modal_image_text",
        "--loss.category", "multi_modal_image_text",
    ])
    setattr(opts, "model.multi_modal_image_text.name", "clip")
    setattr(opts, "model.text.name", "transformer")
    setattr(opts, "model.text.vocab_size", 100)
    setattr(opts, "model.text.context_length", 16)
    setattr(opts, "model.text.transformer.model_dim", 64)
    setattr(opts, "model.text.transformer.n_transformer_layers", 2)
    setattr(opts, "model.text.transformer.n_heads_per_layer", [4])
    setattr(opts, "model.text.transformer.causal_masking", True)
    setattr(opts, "model.multi_modal_image_text.clip.projection_dim", 32)
    return opts


def test_clip_forward_and_contrastive_loss():
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model

    opts = _clip_opts()
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    batch = model.dummy_input_and_label(4)

    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch["samples"],
                           training=False)
    out = model.apply(variables, batch["samples"], training=False)
    assert out["image"].shape == (4, 32)
    assert out["text"].shape == (4, 32)
    # embeddings are normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image"], np.float32), axis=-1), 1.0,
        atol=1e-3)

    @jax.jit
    def loss_and_grad(params):
        def loss_fn(p):
            v = dict(variables, params=p)
            if "batch_stats" in variables:
                pred, _ = model.apply(v, batch["samples"], training=True,
                                      mutable=["batch_stats"],
                                      rngs={"dropout": rng})
            else:
                pred = model.apply(v, batch["samples"], training=True,
                                   rngs={"dropout": rng})
            loss = criteria(batch["samples"], pred, batch["targets"], training=True)
            return loss["total_loss"] if isinstance(loss, dict) else loss
        return jax.value_and_grad(loss_fn)(params)

    loss, grads = loss_and_grad(variables["params"])
    assert jnp.isfinite(loss)
    # logit_scale must receive gradient
    assert abs(float(grads["logit_scale"])) >= 0.0


def test_clip_zero_shot_logits():
    from cvnets_tpu.models import get_model

    opts = _clip_opts()
    model = get_model(opts)
    batch = model.dummy_input_and_label(2)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch["samples"],
                           training=False)
    class_emb = np.random.default_rng(0).standard_normal((10, 32)).astype(np.float32)
    class_emb /= np.linalg.norm(class_emb, axis=-1, keepdims=True)
    out = model.apply(
        variables,
        {"image": batch["samples"]["image"], "text": jnp.asarray(class_emb)},
        training=False,
    )
    assert out["zero_shot_image_logits"].shape == (2, 10)


def test_clip_tokenizer_fallback():
    import argparse

    from cvnets_tpu.data.text_tokenizer.clip_tokenizer import ClipTokenizer

    opts = argparse.Namespace()
    setattr(opts, "model.text.context_length", 16)
    setattr(opts, "model.text.vocab_size", 1000)
    tok = ClipTokenizer(opts)
    ids = tok("A photo of a cat.")
    assert ids.shape == (16,)
    assert ids[0] == tok.get_sot_token()
    assert tok.get_eot_token() in ids
    # deterministic
    np.testing.assert_array_equal(ids, tok("A photo of a cat."))
