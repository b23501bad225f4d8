"""Video pipeline tests: spatio-temporal model, clip sampling, voting eval path."""

import jax
import jax.numpy as jnp
import numpy as np


def test_spatio_temporal_forward_and_grad():
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.classification.name", "mobilenetv2",
        "--dataset.category", "video_classification",
        "--loss.category", "classification",
    ])
    setattr(opts, "model.video_classification.name", "spatio_temporal")
    setattr(opts, "model.video_classification.n_classes", 6)
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    batch = model.dummy_input_and_label(2)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch["samples"],
                           training=False)
    out = model.apply(variables, batch["samples"], training=False)
    assert out.shape == (2, 6)

    def loss_fn(p):
        v = dict(variables, params=p)
        pred, _ = model.apply(v, batch["samples"], training=True,
                              mutable=["batch_stats"], rngs={"dropout": rng})
        loss = criteria(batch["samples"], pred, batch["targets"], training=True)
        return loss["total_loss"] if isinstance(loss, dict) else loss

    loss, _ = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert jnp.isfinite(loss)


def test_frame_folder_reader_clip_sampling(tmp_path):
    import argparse

    from PIL import Image

    from cvnets_tpu.data.video_reader.base_av_reader import FrameFolderReader

    vdir = tmp_path / "vid"
    vdir.mkdir()
    for i in range(20):
        Image.new("RGB", (32, 32), (i * 10 % 255, 0, 0)).save(
            vdir / f"frame_{i:04d}.jpg")

    opts = argparse.Namespace()
    setattr(opts, "video_reader.frames_per_clip", 8)
    setattr(opts, "video_reader.clips_per_video", 2)
    reader = FrameFolderReader(opts, is_training=False)
    blob = reader.read_video(str(vdir))
    assert blob["video"].shape == (2, 8, 32, 32, 3)
    # eval clips are deterministic and spread over the video
    blob2 = reader.read_video(str(vdir))
    np.testing.assert_array_equal(blob["video"], blob2["video"])
