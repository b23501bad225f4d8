"""Reparameterization test: train-mode branches fold into one conv with identical
outputs (MobileOne get_exportable_model semantics)."""

import jax
import jax.numpy as jnp
import numpy as np


def _opts():
    from cvnets_tpu.options.opts import get_training_arguments

    return get_training_arguments(args=[])


def test_mobileone_block_reparam_equivalence():
    from cvnets_tpu.modules.mobileone_block import MobileOneBlock
    from cvnets_tpu.utils.reparam_utils import reparameterize_mobileone_block

    opts = _opts()
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 8, 8, 16)).astype(np.float32))

    # depthwise 3x3 block with identity + scale branches + 2 conv branches
    block = MobileOneBlock(opts=opts, in_channels=16, out_channels=16,
                           kernel_size=3, stride=1, groups=16,
                           num_conv_branches=2)
    variables = block.init({"params": rng}, x, training=False)
    # randomize BN stats so the fold is non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.random.default_rng(1)
                              .uniform(0.5, 1.5, a.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = dict(variables, batch_stats=bs)
    y_train_arch = block.apply(variables, x, training=False)

    kernel, bias = reparameterize_mobileone_block(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
        kernel_size=3, has_identity=True, num_conv_branches=2,
    )

    inf_block = MobileOneBlock(opts=opts, in_channels=16, out_channels=16,
                               kernel_size=3, stride=1, groups=16,
                               num_conv_branches=2, inference_mode=True)
    inf_vars = inf_block.init({"params": rng}, x, training=False)
    inf_params = {"reparam_conv": {"conv": {"kernel": jnp.asarray(kernel),
                                            "bias": jnp.asarray(bias)}}}
    y_reparam = inf_block.apply({"params": inf_params}, x, training=False)

    np.testing.assert_allclose(np.asarray(y_train_arch), np.asarray(y_reparam),
                               atol=1e-4, rtol=1e-4)


def test_get_exportable_params_walks_tree():
    from cvnets_tpu.modules.mobileone_block import MobileOneBlock
    from cvnets_tpu.utils.reparam_utils import get_exportable_params

    opts = _opts()
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 8, 8))
    block = MobileOneBlock(opts=opts, in_channels=8, out_channels=8,
                           kernel_size=3, groups=8, num_conv_branches=1)
    variables = block.init({"params": rng}, x, training=False)
    out = get_exportable_params(jax.device_get(variables["params"]),
                                jax.device_get(variables["batch_stats"]))
    assert "reparam_conv" in out
    assert out["reparam_conv"]["conv"]["kernel"].shape == (3, 3, 1, 8)
